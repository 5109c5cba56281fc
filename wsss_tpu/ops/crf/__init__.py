from wsss_tpu.ops.crf.config import CRFConfig, hsn_config  # noqa: F401
from wsss_tpu.ops.crf.meanfield import (  # noqa: F401
    crf_label_refine, mean_field)
from wsss_tpu.ops.crf.sharded import mean_field_sharded  # noqa: F401
