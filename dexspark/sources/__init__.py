from dexspark.sources.changelog import (  # noqa: F401
    LOG_FIELDS,
    log_schema,
    read_log,
    read_log_stream,
)
