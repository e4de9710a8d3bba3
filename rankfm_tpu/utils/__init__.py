from rankfm_tpu.utils.data import get_data

__all__ = ["get_data"]
