from mapping_private_tpu.utils.metrics import Metrics, StageStats, metrics

__all__ = ["Metrics", "StageStats", "metrics"]
