"""ViDiT-Q-equivalent quantization library, TPU-native (functional JAX).

Maps to the reference `qdiff/` tree (`/root/reference/qdiff/`):
  spec.py      <- quantizer/base_quantizer.py config surface
  core.py      <- quantizer/{base,dynamic}_quantizer.py math
  qlinear.py   <- models/quant_layer.py + models/stdit_quant_layer.py
  naming.py    <- models/quant_model.py pattern matching / layer selection
  calibrate.py <- scripts/ptq.py calibration flow (offline parts)
"""

from viditq_tpu.quant.spec import (  # noqa: F401
    LayerQuantSpec, QuantSpec, SmoothQuantSpec)
from viditq_tpu.quant.core import (  # noqa: F401
    QParams, compute_qparams, fake_quant, fake_quant_dynamic, minmax,
    qparams_minmax, qparams_grid_search, round_ste)
from viditq_tpu.quant.qlinear import QuantCtx, QuantLinear  # noqa: F401
from viditq_tpu.quant.naming import (  # noqa: F401
    any_pattern_in, pattern_in, resolve_layer_spec)
from viditq_tpu.quant.calibrate import (  # noqa: F401
    calibrate_weight_tables, finalize_act_tables, quant_params_dict,
    load_quant_params_dict)
