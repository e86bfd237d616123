from uegan_tpu.ops.pallas.gam_stats import gam_mean_std_pallas

__all__ = ["gam_mean_std_pallas"]
