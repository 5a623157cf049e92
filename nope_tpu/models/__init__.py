"""Network zoo: pose-conditioned U-Nets, SD-VAE codec, template encoder."""

from nope_tpu.models.unet import PoseUNet  # noqa: F401
from nope_tpu.models.vae import StableDiffusionVAE  # noqa: F401
from nope_tpu.models.ldm_encoder import LDMEncoderUNet  # noqa: F401
