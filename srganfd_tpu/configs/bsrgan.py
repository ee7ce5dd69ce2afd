"""BSRGAN x2 blind-SR GAN with the fork's degradation chain.

Reference surface: ``BSRGAN/bsrgan_config.py`` (crop 320 -> on-device
random-crop 144, batch 16, pixel [20.0] / content [1.0] multi-node /
adversarial [0.5], Adam g 8e-5 / d 2e-4 betas (0.9,0.999) eps 1e-4,
EMA 0.999, milestones (0.5,0.7) gamma 0.85); loop ``BSRGAN/train_bsrgan.py``
(D step first). Degradation: the fork disables ops 2/3/4 so the effective
chain is blur(x2 slots) + JPEG(p=0.9) + final JPEG + final MATLAB bicubic
(``BSRGAN/imgproc.py:492-562``).
"""

from srganfd_tpu.configs.base import ExperimentConfig

degradation_process_parameters_dict = {
    "jpeg_prob": 0.9,
    "scale2_prob": 0.25,
    "shuffle_prob": 0.1,
    "use_sharp": False,
}

d_model_arch_name = "discriminator_unet"
g_model_arch_name = "bsrgan_x2"
upscale_factor = 2
mode = "train"
exp_name = "BSRGAN_x2"
experience_name = "BSRGANsa_x2_bubbles"
optimizing_metric = "LPIPS"


def get_config() -> ExperimentConfig:
    return ExperimentConfig(
        name="bsrgan",
        mode=mode,
        exp_name=exp_name,
        experience_name=experience_name,
        g_arch=g_model_arch_name,
        d_arch=d_model_arch_name,
        upscale_factor=upscale_factor,
        crop_image_size=320,
        gt_image_size=72 * upscale_factor,
        batch_size=16,
        degradation="bsrgan",
        degradation_params=dict(degradation_process_parameters_dict),
        pixel_weight=(20.0,),
        content_weight=(1.0,),
        adversarial_weight=(0.5,),
        feature_nodes=(
            "features.2",
            "features.7",
            "features.16",
            "features.25",
            "features.34",
        ),
        relativistic_gan=False,
        g_step_first=False,
        epochs=15,
        model_lr=8e-5,
        discriminator_lr=2e-4,
        model_betas=(0.9, 0.999),
        model_eps=1e-4,
        model_ema_decay=0.999,
        lr_scheduler_milestones=(0.5, 0.7),
        lr_scheduler_gamma=0.85,
        optimizing_metric=optimizing_metric,
    )
