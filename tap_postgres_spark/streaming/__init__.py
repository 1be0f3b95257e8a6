from .runner import StreamingCdcRunner  # noqa: F401
