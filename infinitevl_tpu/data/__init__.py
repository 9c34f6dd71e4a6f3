from .loader import (
    DatasetAttr,
    SimpleTokenizer,
    convert_alpaca,
    convert_sharegpt,
    encode_supervised,
    greedy_knapsack,
    load_dataset_info,
    load_examples,
    pack_examples,
    shift_labels,
)
from .processing import (
    InfiniteVLProcessor,
    ProcessorOutput,
    patchify,
    patchify_device,
    preprocess_image,
    preprocess_video,
    smart_resize,
)
from .template import IGNORE_INDEX, Template, get_template, register_template

__all__ = [k for k in dir() if not k.startswith("_")]
