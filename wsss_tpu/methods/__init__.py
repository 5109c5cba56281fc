from wsss_tpu.methods.gradcam_cues import (  # noqa: F401
    ADPCueGenerator, VOCDeepGlobeCueGenerator, eval_cues_miou)
from wsss_tpu.methods.hsn import ADPHSNSegmenter, HSNSegmenter  # noqa: F401
from wsss_tpu.methods.sec import sec_losses  # noqa: F401
from wsss_tpu.methods.dsrg import dsrg_losses  # noqa: F401
