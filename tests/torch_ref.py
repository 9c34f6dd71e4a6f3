"""Loader for the reference PyTorch implementation (read-only at
/root/reference) with pure-torch stand-ins for its `fla` Triton dependency.

The stubs implement what model CONSTRUCTION and the forward paths need:
RMSNorm / FusedRMSNormGated / ShortConvolution, plus EAGER fp32 torch
implementations of the gated-delta-rule kernels (the per-token recurrence
of fla/ops/gated_delta_rule/fused_recurrent.py:85-101, used for both the
chunk and fused_recurrent entry points — the two are numerics-equivalent
at fp32), so the FULL hybrid model incl. DeltaNet layers runs end-to-end
for parity tests."""

from __future__ import annotations

import sys
import types

REF = "/root/reference/infinitevl/infinitevl_standard"

_cache = {}


def _install_fla_stubs():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    if "fla" in sys.modules:
        return

    fla = types.ModuleType("fla")
    layers = types.ModuleType("fla.layers")
    layers_utils = types.ModuleType("fla.layers.utils")
    modules = types.ModuleType("fla.modules")
    ops = types.ModuleType("fla.ops")
    ops_gdr = types.ModuleType("fla.ops.gated_delta_rule")

    def _na(*a, **k):
        raise RuntimeError("triton kernel not available in parity tests")

    layers_utils.get_unpad_data = _na
    layers_utils.index_first_axis = _na
    layers_utils.pad_input = _na

    class RMSNorm(nn.Module):
        def __init__(self, hidden_size, eps=1e-6, elementwise_affine=True):
            super().__init__()
            self.eps = eps
            self.weight = nn.Parameter(torch.ones(hidden_size))

        def forward(self, x):
            var = x.float().pow(2).mean(-1, keepdim=True)
            return (x.float() * torch.rsqrt(var + self.eps)).to(x.dtype) * self.weight

    class FusedRMSNormGated(nn.Module):
        def __init__(self, hidden_size, eps=1e-6, activation="swish", **kw):
            super().__init__()
            self.eps = eps
            self.weight = nn.Parameter(torch.ones(hidden_size))

        def forward(self, x, g):
            var = x.float().pow(2).mean(-1, keepdim=True)
            x = (x.float() * torch.rsqrt(var + self.eps)) * self.weight.float()
            return (x * F.silu(g.float())).to(g.dtype)

    class ShortConvolution(nn.Conv1d):
        def __init__(self, hidden_size, kernel_size, bias=False,
                     activation="silu", use_fast_conv1d=True,
                     device=None, dtype=None):
            super().__init__(hidden_size, hidden_size, kernel_size,
                             groups=hidden_size, bias=bias,
                             padding=kernel_size - 1, device=device, dtype=dtype)
            self.hidden_size = hidden_size
            self.activation = activation

        def forward(self, x, mask=None, cache=None, output_final_state=False,
                    cu_seqlens=None):
            B, T, D = x.shape
            y = super().forward(x.transpose(1, 2))[..., :T].transpose(1, 2)
            if self.activation is not None:
                y = F.silu(y)
            return y, None

    def _l2norm(x, eps=1e-6):
        # fla/modules/l2norm.py:21-43: x * rsqrt(sum(x^2) + eps), fp32
        xf = x.float()
        return xf * torch.rsqrt(xf.pow(2).sum(-1, keepdim=True) + eps)

    def _eager_gated_delta_rule(
        q, k, v, g, beta, scale=None, initial_state=None,
        output_final_state=False, cu_seqlens=None,
        use_qk_l2norm_in_kernel=False, **kw,
    ):
        """Eager per-token recurrence of the reference Triton kernel
        (fused_recurrent.py:85-101): S = exp(g)*S; verr = beta*(v - k.S);
        S += k (x) verr; o = (scale*q).S — all fp32, q/k l2-normalized."""
        assert cu_seqlens is None, "varlen not needed in parity tests"
        if scale is None:
            scale = q.shape[-1] ** -0.5
        if use_qk_l2norm_in_kernel:
            qf, kf = _l2norm(q) * scale, _l2norm(k)
        else:
            qf, kf = q.float() * scale, k.float()
        vf, gf, bf = v.float(), g.float(), beta.float()
        B, T, H, K = qf.shape
        V = vf.shape[-1]
        S = (
            initial_state.float().clone()
            if initial_state is not None
            else torch.zeros(B, H, K, V)
        )
        o = torch.zeros(B, T, H, V)
        for t in range(T):
            S = S * gf[:, t].exp()[..., None, None]
            pred = torch.einsum("bhk,bhkv->bhv", kf[:, t], S)
            verr = (vf[:, t] - pred) * bf[:, t][..., None]
            S = S + torch.einsum("bhk,bhv->bhkv", kf[:, t], verr)
            o[:, t] = torch.einsum("bhk,bhkv->bhv", qf[:, t], S)
        return o.to(v.dtype), (S if output_final_state else None)

    modules.RMSNorm = RMSNorm
    modules.FusedRMSNormGated = FusedRMSNormGated
    modules.ShortConvolution = ShortConvolution
    # chunk and fused_recurrent are numerics-equivalent; the eager
    # recurrence serves both entry points at fp32
    ops_gdr.chunk_gated_delta_rule = _eager_gated_delta_rule
    ops_gdr.fused_recurrent_gated_delta_rule = _eager_gated_delta_rule

    fla.layers = layers
    fla.modules = modules
    fla.ops = ops
    layers.utils = layers_utils
    ops.gated_delta_rule = ops_gdr
    for name, m in [
        ("fla", fla), ("fla.layers", layers),
        ("fla.layers.utils", layers_utils), ("fla.modules", modules),
        ("fla.ops", ops), ("fla.ops.gated_delta_rule", ops_gdr),
    ]:
        sys.modules[name] = m


def load_reference():
    """Returns (configuration module, modeling module) of the reference,
    importing them once per process as package `refivl`."""
    if "mod" in _cache:
        return _cache["cfgmod"], _cache["mod"]
    import importlib.util

    _install_fla_stubs()
    pkg = types.ModuleType("refivl")
    pkg.__path__ = [REF]
    sys.modules["refivl"] = pkg
    spec = importlib.util.spec_from_file_location(
        "refivl.configuration_infinitevl", f"{REF}/configuration_infinitevl.py"
    )
    cfgmod = importlib.util.module_from_spec(spec)
    sys.modules["refivl.configuration_infinitevl"] = cfgmod
    spec.loader.exec_module(cfgmod)
    spec = importlib.util.spec_from_file_location(
        "refivl.modeling_infinitevl", f"{REF}/modeling_infinitevl.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refivl.modeling_infinitevl"] = mod
    spec.loader.exec_module(mod)
    _cache["cfgmod"], _cache["mod"] = cfgmod, mod
    return cfgmod, mod


def _load_state_dict(path):
    """Single-file OR sharded-directory safetensors -> one state dict
    (real released checkpoints ship model-0000x-of-0000y.safetensors with
    an index; test fixtures export a single model.safetensors)."""
    import json
    import os

    from safetensors.torch import load_file

    if not os.path.isdir(path):
        return load_file(path)
    index = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            shards = sorted(set(json.load(f)["weight_map"].values()))
    else:
        shards = sorted(
            f for f in os.listdir(path) if f.endswith(".safetensors")
        )
    state = {}
    for s in shards:
        state.update(load_file(os.path.join(path, s)))
    return state


def build_torch_model(hf_config_dict, safetensors_path):
    """Construct the reference model (eager attention, fp32) and load a
    checkpoint — a single .safetensors file or a sharded checkpoint dir."""
    import torch

    cfgmod, mod = load_reference()
    tcfg = cfgmod.InfiniteVLConfig(**hf_config_dict)
    tcfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = mod.InfiniteVLQwen2_5_VLForConditionalGeneration(tcfg)
    # every InfiniteVLSelfAttention.__init__ forces flash_attention_2 on the
    # shared config object (modeling_infinitevl.py:1028); reset after build
    model.config._attn_implementation = "eager"
    model = model.eval().float()
    missing, unexpected = model.load_state_dict(
        _load_state_dict(safetensors_path), strict=False
    )
    assert not unexpected, f"unexpected keys: {unexpected[:5]}"
    model.tie_weights()
    return model
