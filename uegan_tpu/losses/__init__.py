from uegan_tpu.losses.gan import gan_loss, multiscale_gan_loss
from uegan_tpu.losses.reconstruction import multiscale_rec_loss, rec_criterion
from uegan_tpu.losses.perceptual import perceptual_loss, vgg_feature_weights
from uegan_tpu.losses.extra import tv_loss, angular_loss, emd_loss

__all__ = [
    "gan_loss",
    "multiscale_gan_loss",
    "multiscale_rec_loss",
    "rec_criterion",
    "perceptual_loss",
    "vgg_feature_weights",
    "tv_loss",
    "angular_loss",
    "emd_loss",
]
