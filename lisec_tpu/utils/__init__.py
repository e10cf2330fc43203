from lisec_tpu.utils.profiling import trace, Timer, device_sync

__all__ = ["trace", "Timer", "device_sync"]
