"""Oracle loader for the reference's torch models (STDiT / PixArt / DiT).

Imports the reference sources at TEST TIME from the read-only mount with
lightweight stand-ins for the GPU-only / heavyweight deps it expects
(xformers, timm, colossalai, mmengine) — nothing is vendored. The stubs are
pure-torch equivalents:
  * timm DropPath -> identity (eval, drop_prob=0)
  * timm Mlp -> fc1/act/fc2
  * xformers memory_efficient_attention + BlockDiagonalMask -> SDPA with a
    materialized block-diagonal additive bias
  * colossalai / mmengine -> minimal attribute shells (registry, ckpt io)
"""

import importlib
import importlib.machinery
import os
import sys
import types


def _module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    # some libs probe __spec__ (importlib.util.find_spec) on our stand-ins
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod

REF_T2V = "/root/reference/t2v"
REF_T2I = "/root/reference/t2i"
REF_ROOT = "/root/reference"


def _install_stubs():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    if "timm" in sys.modules and getattr(sys.modules["timm"], "_viditq_stub",
                                         False):
        return

    # ---- timm ----
    timm = _module("timm")
    timm._viditq_stub = True
    timm_models = _module("timm.models")
    timm_layers = _module("timm.models.layers")
    timm_vit = _module("timm.models.vision_transformer")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, drop=0.0,
                     bias=True):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    class PatchEmbed(nn.Module):
        """timm PatchEmbed (conv proj + flatten), positional signature
        (img_size, patch_size, in_chans, embed_dim)."""

        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True,
                     bias=True):
            super().__init__()
            self.patch_size = to_2tuple(patch_size)
            img = to_2tuple(img_size)
            self.grid_size = (img[0] // self.patch_size[0],
                              img[1] // self.patch_size[1])
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.flatten = flatten
            self.proj = nn.Conv2d(in_chans, embed_dim,
                                  kernel_size=self.patch_size,
                                  stride=self.patch_size, bias=bias)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)
            return self.norm(x)

    class Attention(nn.Module):
        """timm ViT Attention (fused qkv + proj); PixArt_blocks subclasses
        it for the qkv/proj parameters and overrides forward."""

        def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0,
                     proj_drop=0.0, **kw):
            super().__init__()
            self.num_heads = num_heads
            self.head_dim = dim // num_heads
            self.scale = self.head_dim ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.attn_drop = nn.Dropout(attn_drop)
            self.proj = nn.Linear(dim, dim)
            self.proj_drop = nn.Dropout(proj_drop)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                      self.head_dim).permute(2, 0, 3, 1, 4)
            q, k, v = qkv.unbind(0)
            out = F.scaled_dot_product_attention(q, k, v)
            return self.proj(out.transpose(1, 2).reshape(B, N, C))

    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_vit.Mlp = Mlp
    timm_vit.Attention = Attention
    timm_vit.PatchEmbed = PatchEmbed
    timm_models.layers = timm_layers
    timm_models.vision_transformer = timm_vit
    timm.models = timm_models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = timm_layers
    sys.modules["timm.models.vision_transformer"] = timm_vit

    # ---- xformers ----
    xf = _module("xformers")
    xf_ops = _module("xformers.ops")
    xf_fmha = _module("xformers.ops.fmha")

    class BlockDiagonalMask:
        def __init__(self, q_seqlen, kv_seqlen):
            self.q_seqlen = list(q_seqlen)
            self.kv_seqlen = list(kv_seqlen)

        @classmethod
        def from_seqlens(cls, q_seqlen, kv_seqlen=None):
            return cls(q_seqlen, kv_seqlen if kv_seqlen is not None
                       else q_seqlen)

        def materialize(self, shape, dtype, device):
            bias = torch.full(shape[-2:], float("-inf"), dtype=dtype,
                              device=device)
            qi = ki = 0
            for ql, kl in zip(self.q_seqlen, self.kv_seqlen):
                bias[qi:qi + ql, ki:ki + kl] = 0.0
                qi += ql
                ki += kl
            return bias

    def memory_efficient_attention(q, k, v, p=0.0, attn_bias=None,
                                   scale=None):
        # xformers layout [B, M, H, K] -> torch SDPA [B, H, M, K]
        qt, kt, vt = (t.transpose(1, 2) for t in (q, k, v))
        mask = None
        if attn_bias is not None:
            mask = attn_bias.materialize(
                (q.shape[1], k.shape[1]), torch.float32, q.device)
        out = F.scaled_dot_product_attention(
            qt.float(), kt.float(), vt.float(), attn_mask=mask, scale=scale)
        return out.transpose(1, 2).to(q.dtype)

    xf_fmha.BlockDiagonalMask = BlockDiagonalMask
    xf_ops.fmha = xf_fmha
    xf_ops.memory_efficient_attention = memory_efficient_attention
    xf.ops = xf_ops
    sys.modules["xformers"] = xf
    sys.modules["xformers.ops"] = xf_ops
    sys.modules["xformers.ops.fmha"] = xf_fmha

    # ---- mmengine (registry only) ----
    mm = _module("mmengine")
    mm_reg = _module("mmengine.registry")

    class Registry:
        def __init__(self, name, *a, **k):
            self.name = name
            self._d = {}

        def register_module(self, name=None, module=None):
            def deco(mod):
                self._d[name or mod.__name__] = mod
                return mod
            return deco(module) if module is not None else deco

        def get(self, key):
            return self._d[key]

    mm_reg.Registry = Registry
    mm.registry = mm_reg
    sys.modules["mmengine"] = mm
    sys.modules["mmengine.registry"] = mm_reg

    # ---- mmcv (t2i builder Registry + logging) ----
    mmcv = _module("mmcv")
    mmcv.Registry = Registry
    mmcv_utils = _module("mmcv.utils")
    mmcv_logging = _module("mmcv.utils.logging")
    mmcv_logging.logger_initialized = {}
    mmcv_utils.logging = mmcv_logging
    mmcv_runner = _module("mmcv.runner")
    mmcv_runner.get_dist_info = lambda: (0, 1)
    mmcv_runner.build_optimizer = lambda *a, **k: None
    mmcv_runner.OPTIMIZER_BUILDERS = Registry("optim")
    mmcv_runner.DefaultOptimizerConstructor = object
    mmcv_runner.OPTIMIZERS = Registry("optimizers")
    mmcv.utils = mmcv_utils
    mmcv.runner = mmcv_runner
    mmcv.__path__ = []
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.utils"] = mmcv_utils
    sys.modules["mmcv.utils.logging"] = mmcv_logging
    sys.modules["mmcv.runner"] = mmcv_runner

    # ---- torchvision (pulled by opensora/__init__ datasets) ----
    tv = _module("torchvision")
    tv_tf = _module("torchvision.transforms")
    tv_io = _module("torchvision.io")
    tv_ds = _module("torchvision.datasets")
    tv_ds_utils = _module("torchvision.datasets.utils")

    class _AnyAttr(types.SimpleNamespace):
        def __getattr__(self, name):
            return lambda *a, **k: None

    tv_tf.Compose = lambda ts: (lambda x: x)
    tv_tf.Lambda = lambda f: f
    tv_tf.ToTensor = object
    tv_tf.Normalize = lambda *a, **k: (lambda x: x)
    tv_tf.RandomHorizontalFlip = lambda *a, **k: (lambda x: x)
    tv_io.read_video = lambda *a, **k: None
    tv_io.write_video = lambda *a, **k: None
    tv_ds_utils.download_url = lambda *a, **k: None
    tv_ds_folder = _module("torchvision.datasets.folder")
    tv_ds_folder.IMG_EXTENSIONS = (".jpg", ".jpeg", ".png")
    tv_ds_folder.pil_loader = lambda p: None
    tv_utils = _module("torchvision.utils")
    tv_utils.save_image = lambda *a, **k: None
    tv_ds.utils = tv_ds_utils
    tv_ds.folder = tv_ds_folder
    tv_ds.__path__ = []  # mark as package for submodule imports
    tv.transforms = tv_tf
    tv.io = tv_io
    tv.datasets = tv_ds
    tv.utils = tv_utils
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv_tf
    sys.modules["torchvision.io"] = tv_io
    sys.modules["torchvision.datasets"] = tv_ds
    sys.modules["torchvision.datasets.utils"] = tv_ds_utils
    sys.modules["torchvision.datasets.folder"] = tv_ds_folder
    sys.modules["torchvision.utils"] = tv_utils

    # ---- omegaconf (qdiff.utils pulls ListConfig) ----
    if "omegaconf" not in sys.modules:
        oc = _module("omegaconf")

        class ListConfig(list):
            pass

        class DictConfig(dict):
            pass

        class OmegaConf:
            @staticmethod
            def load(path):
                import yaml
                with open(path) as f:
                    return yaml.safe_load(f)

        oc.ListConfig = ListConfig
        oc.DictConfig = DictConfig
        oc.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = oc

    # ---- text-encoder prompt-cleaning deps (t5.py) ----
    for name in ("ftfy", "bs4"):
        if name not in sys.modules:
            m = _module(name)
            m.fix_text = lambda s: s
            m.BeautifulSoup = object
            sys.modules[name] = m

    # ---- diffusers (vae.py AutoencoderKL wrapper; unused in parity) ----
    if "diffusers" not in sys.modules:
        df = _module("diffusers")
        df_models = _module("diffusers.models")

        class AutoencoderKL:
            @classmethod
            def from_pretrained(cls, *a, **k):
                raise RuntimeError("stub")

        df.AutoencoderKL = AutoencoderKL
        df_models.AutoencoderKL = AutoencoderKL
        df_models.AutoencoderKLTemporalDecoder = AutoencoderKL
        df.models = df_models
        sys.modules["diffusers"] = df
        sys.modules["diffusers.models"] = df_models

    # ---- colossalai (attribute shells for ckpt_utils import) ----
    for name in ("colossalai", "colossalai.booster", "colossalai.cluster",
                 "colossalai.checkpoint_io"):
        mod = _module(name)
        sys.modules[name] = mod
    sys.modules["colossalai.booster"].Booster = object
    sys.modules["colossalai.cluster"].DistCoordinator = object
    sys.modules["colossalai.checkpoint_io"].GeneralCheckpointIO = object
    sys.modules["colossalai"].booster = sys.modules["colossalai.booster"]
    sys.modules["colossalai"].cluster = sys.modules["colossalai.cluster"]
    sys.modules["colossalai"].checkpoint_io = \
        sys.modules["colossalai.checkpoint_io"]


def _install_qdiff_diffusers_stubs():
    """Extra diffusers submodule stand-ins needed by qdiff/models/
    quant_block.py (diffusers==0.24 internals). Fresh classes (never
    `object`) so isinstance checks in the reference stay selective."""
    import torch.nn as nn

    df = sys.modules.get("diffusers") or _module("diffusers")
    sys.modules["diffusers"] = df
    if getattr(df, "_viditq_qdiff_stub", False):
        return
    df._viditq_qdiff_stub = True

    utils = _module("diffusers.utils")
    utils.USE_PEFT_BACKEND = False
    utils.deprecate = lambda *a, **k: None
    utils.logging = types.SimpleNamespace(
        get_logger=lambda *a, **k: __import__("logging").getLogger("stub"))
    iu = _module("diffusers.utils.import_utils")
    iu.is_xformers_available = lambda: False
    tu = _module("diffusers.utils.torch_utils")
    tu.maybe_allow_in_graph = lambda cls: cls
    utils.import_utils = iu
    utils.torch_utils = tu

    models = sys.modules.get("diffusers.models") or _module("diffusers.models")
    acts = _module("diffusers.models.activations")
    acts.get_activation = lambda name: nn.GELU()

    class GEGLU(nn.Module):
        pass

    class GELU(nn.Module):
        pass

    class ApproximateGELU(nn.Module):
        pass

    acts.GEGLU, acts.GELU, acts.ApproximateGELU = GEGLU, GELU, ApproximateGELU
    emb = _module("diffusers.models.embeddings")

    class SinusoidalPositionalEmbedding(nn.Module):
        pass

    emb.SinusoidalPositionalEmbedding = SinusoidalPositionalEmbedding
    resnet = _module("diffusers.models.resnet")
    for nm in ("ResnetBlock2D", "Upsample2D", "Downsample2D"):
        setattr(resnet, nm, type(nm, (nn.Module,), {}))
    attention = _module("diffusers.models.attention")
    attention.BasicTransformerBlock = type("BasicTransformerBlock",
                                           (nn.Module,), {})
    ap = _module("diffusers.models.attention_processor")
    # star-imported: QuantAttention's signature annotates `attn: Attention`
    ap.Attention = type("Attention", (nn.Module,), {})
    ap.SpatialNorm = type("SpatialNorm", (nn.Module,), {})
    for nm in ("AttentionProcessor", "AttnProcessor", "AttnProcessor2_0",
               "AttnAddedKVProcessor", "AttnAddedKVProcessor2_0",
               "CustomDiffusionAttnProcessor",
               "CustomDiffusionAttnProcessor2_0",
               "CustomDiffusionXFormersAttnProcessor",
               "LoRAAttnAddedKVProcessor", "LoRAAttnProcessor",
               "LoRAAttnProcessor2_0", "LoRAXFormersAttnProcessor",
               "SlicedAttnAddedKVProcessor", "SlicedAttnProcessor",
               "XFormersAttnAddedKVProcessor", "XFormersAttnProcessor"):
        setattr(ap, nm, type(nm, (), {}))
    lora = _module("diffusers.models.lora")
    lora.LoRACompatibleConv = type("LoRACompatibleConv", (nn.Module,), {})
    lora.LoRACompatibleLinear = type("LoRACompatibleLinear", (nn.Module,), {})
    norm = _module("diffusers.models.normalization")
    for nm in ("AdaGroupNorm", "AdaLayerNorm", "AdaLayerNormZero"):
        setattr(norm, nm, type(nm, (nn.Module,), {}))

    models.activations = acts
    models.embeddings = emb
    models.resnet = resnet
    models.attention = attention
    models.attention_processor = ap
    models.lora = lora
    models.normalization = norm
    df.utils = utils
    df.models = models
    for name, mod in (
            ("diffusers.utils", utils),
            ("diffusers.utils.import_utils", iu),
            ("diffusers.utils.torch_utils", tu),
            ("diffusers.models", models),
            ("diffusers.models.activations", acts),
            ("diffusers.models.embeddings", emb),
            ("diffusers.models.resnet", resnet),
            ("diffusers.models.attention", attention),
            ("diffusers.models.attention_processor", ap),
            ("diffusers.models.lora", lora),
            ("diffusers.models.normalization", norm)):
        sys.modules[name] = mod


def load_qdiff():
    """Import the reference quantization library (qdiff.models.quant_model
    + friends) from the read-only mount — the PTQ-driver oracle."""
    _install_stubs()
    _install_qdiff_diffusers_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    return importlib.import_module("qdiff.models.quant_model")


def _seed_opensora_env():
    """sys.path + opensora.datasets pre-seed shared by the t2v model
    loaders: the datasets package's transitive imports pull the full
    qdiff->diffusers chain, irrelevant for model parity."""
    _install_stubs()
    if REF_T2V not in sys.path:
        sys.path.insert(0, REF_T2V)
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)  # qdiff (stdit forward's mask check)
    if "opensora.datasets" not in sys.modules:
        ds = _module("opensora.datasets")
        for name in ("DatasetFromCSV", "get_transforms_image",
                     "get_transforms_video", "prepare_dataloader",
                     "save_sample"):
            setattr(ds, name, object)
        ds.__all__ = []
        sys.modules["opensora.datasets"] = ds


def load_stdit_module():
    """Import the reference STDiT (t2v/opensora/models/stdit/stdit.py)."""
    _seed_opensora_env()
    return importlib.import_module("opensora.models.stdit.stdit")


def load_pixart_module():
    """Import the reference t2i PixArt (t2i/diffusion/model/nets)."""
    _install_stubs()
    if REF_T2I not in sys.path:
        sys.path.insert(0, REF_T2I)
    return importlib.import_module("diffusion.model.nets.PixArt")


def load_edm_module():
    """Import the reference EDM sampler (t2i/diffusion/model/edm_sample.py:
    Karras Algorithm-2 Heun loop)."""
    _install_stubs()
    if REF_T2I not in sys.path:
        sys.path.insert(0, REF_T2I)
    return importlib.import_module("diffusion.model.edm_sample")


def load_dit_module():
    _seed_opensora_env()
    return importlib.import_module("opensora.models.dit.dit")


def load_iddpm_module():
    """Import the reference IDDPM scheduler package
    (t2v/opensora/schedulers/iddpm: SpacedDiffusion + gaussian_diffusion +
    respace) — the ddim/p_sample loop oracle."""
    _seed_opensora_env()
    return importlib.import_module("opensora.schedulers.iddpm")


def load_latte_module():
    """Import the reference Latte (t2v/opensora/models/latte/latte.py —
    DiT subclass with alternating spatial/temporal blocks)."""
    load_dit_module()  # latte imports `from opensora.models.dit import DiT`
    return importlib.import_module("opensora.models.latte.latte")


def load_video_transforms_module():
    """Import the reference video transform zoo
    (t2v/opensora/datasets/video_transforms.py — pure torch, no stubs
    needed) directly from the read-only mount."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_video_transforms",
        os.path.join(REF_T2V, "opensora/datasets/video_transforms.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
