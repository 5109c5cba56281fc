from wsss_tpu.models.backbones import (  # noqa: F401
    M7Classifier, VGG16Backbone, VGG16Classifier, build_classifier,
    infer_dtype)
from wsss_tpu.models.deeplab import (  # noqa: F401
    DSRGNet, SECNet, sp_softmax)
from wsss_tpu.models.irn import IRNet, edge_displacement_inference  # noqa: F401
