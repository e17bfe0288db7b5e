from saspa_tpu.models.resnet import ResNet, resnet50, resnet101
from saspa_tpu.models.cal import WSDAN_CAL
from saspa_tpu.models.inception import InceptionV3Features
from saspa_tpu.models.clip import CLIPModel, CLIPVisionRN, CLIPVisionViT, clip_preprocess
from saspa_tpu.models.text_encoder import CLIPTextEncoder
from saspa_tpu.models.unet import UNet2DCondition, UNET_CONFIGS, SD15_UNET, SDXL_UNET, SDXL_REFINER_UNET
from saspa_tpu.models.vae import AutoencoderKL, SD_VAE, SDXL_VAE
from saspa_tpu.models.controlnet import ControlNet
from saspa_tpu.models.lpips import LPIPS
from saspa_tpu.models.hed import HED
from saspa_tpu.models.blip_caption import BlipCaptioner, FlaxBlipCaptioner
from saspa_tpu.models.t5 import FlaxKeytotextT5, T5ForGeneration
