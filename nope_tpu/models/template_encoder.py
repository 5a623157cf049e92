"""Template feature extractor (ResNet-50 + 1x1 projector) and its
contrastive losses.

Re-implements the reference's alternative frozen encoder
(``/root/reference/src/model/encoder/template.py`` +
``base_template.py``): a fully-convolutional ResNet-50 backbone with a
2048→256→descriptor_size projector (descriptor_size=8 by default,
``configs/model/template_base.yaml``), optional L2 normalisation, plus
the InfoNCE and occlusion-aware-similarity utilities of the
template-pose lineage.

Duck-typed to the VAE encoder API the task model consumes:
``encode_image(images, mode)`` (mode ignored — features are
deterministic) and ``latent_dim``.  There is no ``decode_latent``; the
task model's RGB previews are disabled for this encoder, like the
reference (``model.py:199-206``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from nope_tpu.models.resnet import resnet50


class TemplateFeatureExtractor(nn.Module):
    descriptor_size: int = 8
    normalize: bool = False

    def setup(self):
        self.backbone = resnet50(use_avg_pooling_and_fc=False)
        self.proj1 = nn.Conv(256, (1, 1), use_bias=False, name="proj1")
        self.proj2 = nn.Conv(self.descriptor_size, (1, 1), use_bias=False, name="proj2")

    @property
    def latent_dim(self) -> int:
        return self.descriptor_size

    def encode_image(self, image: jax.Array, mode=None) -> jax.Array:
        del mode  # deterministic features
        feat = self.backbone(image)
        feat = self.proj1(nn.relu(feat))
        feat = self.proj2(nn.relu(feat))
        if self.normalize:
            feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True).clip(1e-12)
        return feat

    def __call__(self, image: jax.Array) -> jax.Array:
        return self.encode_image(image)


def info_nce_loss(
    pos_sim: jax.Array, neg_sim: jax.Array, tau: float = 0.1
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """InfoNCE over a (B, B) similarity matrix with the positives on the
    diagonal (``base_template.py:27-64``).  Returns
    (mean_pos, mean_neg, loss)."""
    b = neg_sim.shape[0]
    eye = jnp.eye(b, dtype=neg_sim.dtype)
    logits = (1 - eye) * neg_sim + eye * pos_sim
    logits = logits / tau
    labels = jnp.arange(b)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(log_probs[jnp.arange(b), labels])
    return jnp.mean(pos_sim), jnp.mean(neg_sim), loss


def occlusion_aware_similarity(
    similarity_matrix: jax.Array, threshold: float = 0.2
) -> jax.Array:
    """Zero out sub-threshold local similarities
    (``base_template.py:67-75``)."""
    return jnp.where(similarity_matrix <= threshold, 0.0, similarity_matrix)
