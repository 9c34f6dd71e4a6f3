from .infinitevl import encode_vision, forward, get_rope_index, scatter_vision_embeds
from .params import (
    init_params,
    init_text_params,
    init_vision_params,
    load_hf_checkpoint,
    param_count,
)
from .state import DecoderState, clone_state, init_decoder_state, state_bytes
from .text import embed_tokens, lm_head, text_forward
from .vision import VisionPlan, get_vision_plan, vision_forward

__all__ = [k for k in dir() if not k.startswith("_")]
