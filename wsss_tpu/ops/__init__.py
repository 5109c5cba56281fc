from wsss_tpu.ops.cues import (  # noqa: F401
    bg_cues_lowest_decile, fg_cues, fgbg_cues, modify_by_htt,
    resolve_overlap, threshold_cams)
from wsss_tpu.ops.filters import (  # noqa: F401
    gaussian_blur, median3, resize_bilinear, resize_nearest)
from wsss_tpu.ops.gradcam import (  # noqa: F401
    cs_gradcam, grad_cam, grad_cam_confidence, gradcam_weights)
from wsss_tpu.ops.random_walk import (  # noqa: F401
    PathIndex, propagate_to_edge, to_affinity)
from wsss_tpu.ops.region_grow import region_grow  # noqa: F401
