from saspa_tpu.models.resnet import ResNet, resnet50, resnet101
from saspa_tpu.models.cal import WSDAN_CAL
