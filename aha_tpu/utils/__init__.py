from aha_tpu.utils import dist, telemetry

__all__ = ["dist", "telemetry"]
