"""Flax model zoo: all generator and discriminator families of the
reference (ESRGAN / BSRGAN / Real-ESRGAN / A-ESRGAN) in NHWC, plus the
string-keyed arch registry (`create_model`) mirroring the reference's
``model.__dict__[arch_name]()`` factory pattern."""

from srganfd_tpu.models.registry import create_model, list_models, register  # noqa: F401
from srganfd_tpu.models import generators as generators  # noqa: F401
from srganfd_tpu.models import discriminators as discriminators  # noqa: F401
