from ted_spad_tpu.ops import losses, metrics, temporal

__all__ = ["losses", "metrics", "temporal"]
