from dexspark.operators.routing import (  # noqa: F401
    route_by_config,
    route_by_config_2key,
    split_required_fields,
)
