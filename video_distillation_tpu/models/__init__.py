from .classic import MLP, VGG, AlexNet, LeNet, ResNet
from .convnet2d import ConvNet2D
from .convnet3d import ConvNet3D
from .hallucinator import Hallucinator
from .registry import (create_model, get_eval_pool, init_model,
                       is_video_model, sample_input)
from .video_nets import VideoConvNet

__all__ = [
    "MLP", "VGG", "AlexNet", "LeNet", "ResNet", "ConvNet2D", "ConvNet3D",
    "Hallucinator", "VideoConvNet", "create_model", "get_eval_pool",
    "init_model", "is_video_model", "sample_input",
]
