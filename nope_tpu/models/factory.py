"""Model factory: config → (U-Net, encoder, task).

The Hydra ``_target_`` instantiation of the reference
(``configs/model/*.yaml`` → ``hydra.utils.instantiate``) becomes explicit
construction — with the reference's stale ``src.model.base`` targets
(SURVEY appendix item 3) impossible by design.
"""

from __future__ import annotations

from nope_tpu.configs.config import EncoderConfig, ModelConfig, UNetConfig
from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig


def build_encoder(cfg: EncoderConfig):
    if cfg.kind == "vae":
        from nope_tpu.models.vae import StableDiffusionVAE

        return StableDiffusionVAE(
            latent_channels=cfg.latent_dim,
            block_out_channels=tuple(cfg.block_out_channels),
            layers_per_block=cfg.layers_per_block,
            groups=cfg.norm_groups,
        )
    if cfg.kind == "template":
        from nope_tpu.models.template_encoder import TemplateFeatureExtractor

        return TemplateFeatureExtractor(
            descriptor_size=cfg.descriptor_size, normalize=cfg.normalize
        )
    if cfg.kind == "template_tiny":
        from nope_tpu.models.template_encoder import BaseFeatureExtractor

        return BaseFeatureExtractor(descriptor_size=cfg.descriptor_size)
    raise ValueError(f"unknown encoder kind {cfg.kind!r}")


def build_unet(cfg: UNetConfig, latent_dim: int):
    if cfg.variant in ("vae_base", "template_base"):
        from nope_tpu.models.unet import PoseUNet

        return PoseUNet(
            u_net_dim=cfg.u_net_dim,
            channels=latent_dim,
            rot_representation_dim=cfg.rot_representation_dim,
            pose_mlp_name=cfg.pose_mlp_name,
            dim_mults=tuple(cfg.dim_mults),
            resnet_block_groups=cfg.resnet_block_groups,
            double_bottleneck=cfg.double_bottleneck,
        )
    if cfg.variant == "vae_cin_ldm":
        from nope_tpu.models.ldm_unet import LDMPoseUNet

        return LDMPoseUNet(
            in_channels=latent_dim,
            out_channels=latent_dim,
            model_channels=cfg.model_channels,
            num_res_blocks=cfg.num_res_blocks,
            attention_resolutions=tuple(cfg.attention_resolutions),
            channel_mult=tuple(cfg.channel_mult),
            num_head_channels=cfg.num_head_channels,
            context_dim=cfg.context_dim,
            transformer_depth=cfg.transformer_depth,
            rot_representation_dim=cfg.rot_representation_dim,
            pose_mlp_name=cfg.pose_mlp_name,
            injecting_condition_twice=cfg.injecting_condition_twice,
        )
    if cfg.variant == "vae_guidedDiffusion":
        from nope_tpu.models.adm_unet import ADMPoseUNet

        return ADMPoseUNet(
            in_channels=latent_dim,
            out_channels=latent_dim,
            model_channels=cfg.model_channels,
            num_res_blocks=cfg.num_res_blocks,
            attention_resolutions=tuple(cfg.gd_attention_resolutions),
            channel_mult=tuple(cfg.gd_channel_mult),
            num_head_channels=cfg.num_head_channels,
            num_heads=cfg.num_heads,
            use_scale_shift_norm=cfg.use_scale_shift_norm,
            resblock_updown=cfg.resblock_updown,
            rot_representation_dim=cfg.rot_representation_dim,
            pose_mlp_name=cfg.pose_mlp_name,
        )
    raise ValueError(f"unknown u_net variant {cfg.variant!r}")


def build_task(cfg: ModelConfig) -> PoseConditionalTask:
    encoder = build_encoder(cfg.encoder)
    unet = build_unet(cfg.u_net, latent_dim=cfg.encoder.latent_dim)
    task_cfg = TaskConfig(
        loss_type=cfg.optim_config.loss_type,
        use_inv_deltaR=cfg.optim_config.use_inv_deltaR,
        similarity_metric=cfg.testing_config.similarity_metric,
        retrieval_k=cfg.testing_config.retrieval_k,
        using_KL=cfg.encoder.using_KL,
        half_precision_eval=cfg.testing_config.half_precision_eval,
    )
    return PoseConditionalTask(unet, encoder, task_cfg)
