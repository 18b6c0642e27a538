from dexspark.streaming.replay import CdcStreamReplay  # noqa: F401
