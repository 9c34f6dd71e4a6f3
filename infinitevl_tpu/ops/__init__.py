from .delta_rule import (
    delta_rule_chunk,
    delta_rule_recurrent,
    delta_rule_step,
    gated_delta_rule,
)
from .norms import l2norm, rms_norm, rms_norm_gated, silu
from .rope import (
    apply_rotary,
    apply_rotary_vision,
    default_inv_freq,
    mrope_cos_sin,
    vision_cos_sin,
    vision_rot_pos_ids,
)
from .short_conv import (
    causal_conv1d,
    conv_state_update,
    short_conv,
    short_conv_step,
)
from .swa import (
    attention_dense,
    ring_slot_positions,
    ring_write,
    sliding_window_mask,
    swa_cached_attention,
    swa_prefill_dense,
)

__all__ = [k for k in dir() if not k.startswith("_")]
