"""Model zoo: TPU-native rebuilds of the reference's vendored backbones."""

from viditq_tpu.models.registry import MODELS, SCHEDULERS, build_module, register
from viditq_tpu.models.stdit import STDiT, STDiT_XL_2, STDiTBlock  # noqa: F401
from viditq_tpu.models.pixart import (  # noqa: F401
    PixArt, PixArtBlock, PixArt_XL_2, PixArtMS_XL_2)
from viditq_tpu.models.dit import (  # noqa: F401
    DiT, DiTBlock, DiT_XL_2, Latte, Latte_XL_2)
from viditq_tpu.models.mmdit import MMDiT, rectified_flow_sample  # noqa: F401

register(MODELS, "STDiT-XL/2")(STDiT_XL_2)
register(MODELS, "STDiT")(STDiT)
register(MODELS, "PixArt-XL/2")(PixArt_XL_2)
register(MODELS, "PixArtMS-XL/2")(PixArtMS_XL_2)
register(MODELS, "PixArt")(PixArt)
register(MODELS, "DiT-XL/2")(DiT_XL_2)
register(MODELS, "DiT")(DiT)
register(MODELS, "Latte-XL/2")(Latte_XL_2)
register(MODELS, "Latte")(Latte)
register(MODELS, "MMDiT")(MMDiT)
