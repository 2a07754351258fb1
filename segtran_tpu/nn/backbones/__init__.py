from .efficientnet import EfficientNetFeatures, EFFICIENTNET_PARAMS
from .resnet import ResNetFeatures
