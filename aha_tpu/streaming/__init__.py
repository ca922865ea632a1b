from aha_tpu.streaming.engine import StreamEngine
from aha_tpu.streaming.session import StreamSession

__all__ = ["StreamEngine", "StreamSession"]
