from rankfm_tpu.models.rankfm import RankFM

__all__ = ["RankFM"]
