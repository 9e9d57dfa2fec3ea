from .backbone import ResNetBackbone, ResNetFPNBackbone, build_backbone
from .detector import build_detection_model
from .fpn import FPN
from .resnet import FrozenBatchNorm, ResNet, ResNetRoIHead
