from dexspark.multimodal.media import (  # noqa: F401
    MEDIA_SCHEMA,
    extract_features,
    frame_sample,
    to_media,
)
