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


class BaseFeatureExtractor(nn.Module):
    """The reference's tiny standalone conv encoder
    (``base_template.py:78-100``): 8x8/2 conv → ReLU → 5x5 conv → ReLU →
    1x1 projector (7→256→descriptor_size), all VALID padding ("remove
    all the pooling layers, fc layers with conv1x1").

    Note the reference base class's own ``forward`` calls
    ``self.backbone`` which only subclasses define — the sequential
    ``self.encoder`` is the actual feature path, reproduced here.  Same
    duck-typed encoder API as :class:`TemplateFeatureExtractor`.
    """

    descriptor_size: int = 8

    def setup(self):
        self.layer1 = nn.Conv(16, (8, 8), strides=(2, 2), padding="VALID", name="layer1")
        self.layer2 = nn.Conv(7, (5, 5), padding="VALID", name="layer2")
        self.proj1 = nn.Conv(256, (1, 1), use_bias=False, name="proj1")
        self.proj2 = nn.Conv(self.descriptor_size, (1, 1), use_bias=False, name="proj2")

    @property
    def latent_dim(self) -> int:
        return self.descriptor_size

    def encode_image(self, image: jax.Array, mode=None) -> jax.Array:
        del mode  # deterministic features
        feat = nn.relu(self.layer1(image))
        feat = nn.relu(self.layer2(feat))
        feat = self.proj2(nn.relu(self.proj1(feat)))
        return feat

    def __call__(self, image: jax.Array) -> jax.Array:
        return self.encode_image(image)


def info_nce_loss(
    pos_sim: jax.Array,
    neg_sim: jax.Array,
    tau: float = 0.1,
    sim_extra_obj: jax.Array | None = None,
    extra_contrast_type: str | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """InfoNCE over a (B, B) similarity matrix with the positives on the
    diagonal (``base_template.py:27-64``).  Returns
    (mean_pos, mean_neg, loss).

    ``sim_extra_obj`` adds extra-object negatives (the BOP↔ShapeNet
    path):

    - ``"BOP_ShapeNet"``: the (B, B) extra similarities widen each row's
      negative set (logits become (B, 2B)).
    - ``"ShapeNet_ShapeNet"``: the extra matrix forms B more anchor rows
      reusing the same positives (logits become (2B, B)).  The
      reference's own branch hard-codes ``.cuda()`` on its labels
      (``base_template.py:55-57``) and crashes on CPU; semantics
      reproduced, device pin dropped.
    """
    b = neg_sim.shape[0]
    eye = jnp.eye(b, dtype=neg_sim.dtype)
    logits = (1 - eye) * neg_sim + eye * pos_sim
    labels = jnp.arange(b)
    if sim_extra_obj is not None:
        sim_extra_obj = sim_extra_obj[:b]
        if extra_contrast_type == "BOP_ShapeNet":
            logits = jnp.concatenate([logits, sim_extra_obj], axis=1)
        elif extra_contrast_type == "ShapeNet_ShapeNet":
            extra_logits = (1 - eye) * sim_extra_obj + eye * pos_sim
            logits = jnp.concatenate([logits, extra_logits], axis=0)
            labels = jnp.concatenate([labels, jnp.arange(b)], axis=0)
        else:
            raise ValueError(f"unknown extra_contrast_type {extra_contrast_type!r}")
    logits = logits / tau
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(log_probs, labels[:, None], axis=1))
    return jnp.mean(pos_sim), jnp.mean(neg_sim), loss


def occlusion_aware_similarity(
    similarity_matrix: jax.Array, threshold: float = 0.2
) -> jax.Array:
    """Zero out sub-threshold local similarities
    (``base_template.py:67-75``)."""
    return jnp.where(similarity_matrix <= threshold, 0.0, similarity_matrix)
