"""Model factory and eval-pool registry.

Parity with ``/root/reference/utils.py:512-625`` (``get_network`` + ~40 model
names incl. depth/width/act/norm/pool ablation variants) and
``utils.py:973-996`` (``get_eval_pool``). Instead of seeding a global RNG
from the wall clock (utils.py:519), models are initialised from an explicit
``jax.random.PRNGKey`` — fresh random nets are fresh keys.

ConvNet3D is forced to net_norm='none', net_pooling='maxpooling' as in the
reference factory (utils.py:608-609).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .classic import MLP, VGG, AlexNet, LeNet, ResNet
from .convnet2d import ConvNet2D
from .convnet3d import ConvNet3D
from .frepo_nets import FRePoConv, KIPConvNet
from .video_nets import VideoConvNet

DEFAULT_WIDTH, DEFAULT_DEPTH = 128, 3
DEFAULT_ACT, DEFAULT_NORM, DEFAULT_POOLING = "relu", "instancenorm", "avgpooling"


def create_model(model: str, channel: int, num_classes: int,
                 im_size: Tuple[int, int] = (32, 32), frames: int = 16):
    """Return an uninitialised flax module for the given model name."""
    w, d, a, n, p = (DEFAULT_WIDTH, DEFAULT_DEPTH, DEFAULT_ACT, DEFAULT_NORM,
                     DEFAULT_POOLING)

    def convnet(**kw):
        base = dict(channel=channel, num_classes=num_classes, net_width=w,
                    net_depth=d, net_act=a, net_norm=n, net_pooling=p,
                    im_size=im_size)
        base.update(kw)
        return ConvNet2D(**base)

    if model == "MLP":
        return MLP(channel=channel, num_classes=num_classes)
    if model == "ConvNet":
        return convnet()
    if model == "LeNet":
        return LeNet(channel=channel, num_classes=num_classes)
    if model == "AlexNet":
        return AlexNet(channel=channel, num_classes=num_classes)
    if model == "AlexNetBN":
        return AlexNet(channel=channel, num_classes=num_classes, use_bn=True)
    if model in ("VGG11", "VGG13", "VGG16", "VGG19"):
        return VGG(vgg_name=model, channel=channel, num_classes=num_classes)
    if model in ("VGG11BN", "VGG13BN", "VGG16BN", "VGG19BN"):
        return VGG(vgg_name=model[:-2], channel=channel,
                   num_classes=num_classes, norm="batchnorm")
    if model == "ResNet18":
        return ResNet(channel=channel, num_classes=num_classes)
    if model == "ResNet18BN":
        return ResNet(channel=channel, num_classes=num_classes, norm="batchnorm")
    if model == "ResNet18BN_AP":
        return ResNet(channel=channel, num_classes=num_classes,
                      norm="batchnorm", avg_pool_down=True)
    if model == "ResNet18_AP":
        return ResNet(channel=channel, num_classes=num_classes,
                      avg_pool_down=True)

    if model.startswith("ConvNetD") and model[8:].isdigit():
        return convnet(net_depth=int(model[8:]))
    if model.startswith("ConvNetW") and model[8:].isdigit():
        return convnet(net_width=int(model[8:]))
    if model == "ConvNetAS":
        return convnet(net_act="sigmoid")
    if model == "ConvNetAR":
        return convnet(net_act="relu")
    if model == "ConvNetAL":
        return convnet(net_act="leakyrelu")
    if model == "ConvNetASwish":
        return convnet(net_act="swish")
    if model == "ConvNetASwishBN":
        return convnet(net_act="swish", net_norm="batchnorm")
    if model == "ConvNetNN":
        return convnet(net_norm="none")
    if model == "ConvNetBN":
        return convnet(net_norm="batchnorm")
    if model == "ConvNetLN":
        return convnet(net_norm="layernorm")
    if model == "ConvNetIN":
        return convnet(net_norm="instancenorm")
    if model == "ConvNetGN":
        return convnet(net_norm="groupnorm")
    if model == "ConvNetNP":
        return convnet(net_pooling="none")
    if model == "ConvNetMP":
        return convnet(net_pooling="maxpooling")
    if model == "ConvNetAP":
        return convnet(net_pooling="avgpooling")

    # FRePo eval-pool nets (FRePo/lib/models/utils.py arch names)
    if model in ("KIP_ConvNet", "kipconv"):
        return KIPConvNet(num_classes=num_classes, width=w, depth=d)
    if model in ("Conv", "conv"):
        return FRePoConv(num_classes=num_classes, width=w, depth=d)
    if model in ("DC_ConvNet", "dcconv"):
        # DC_ConvNet == ConvNet2D with identity norm / avg pool
        return convnet(net_norm="none", net_pooling="avgpooling")

    if model.startswith("VideoConvNet"):
        head = model[len("VideoConvNet"):].lower()
        if head not in ("mean", "mlp", "lstm", "rnn", "gru"):
            raise ValueError(f"unknown model: {model}")
        return VideoConvNet(channel=channel, num_classes=num_classes,
                            net_width=w, net_depth=d, net_act=a, net_norm=n,
                            net_pooling=p, im_size=im_size, head=head)
    if model == "ConvNet3D":
        return ConvNet3D(channel=channel, num_classes=num_classes, net_width=w,
                         net_depth=d, net_act=a, net_norm="none",
                         net_pooling="maxpooling", frames=frames,
                         im_size=im_size)
    raise ValueError(f"unknown model: {model}")


def is_video_model(model: str) -> bool:
    """Models that consume (B, F, H, W, C) clips."""
    return model == "ConvNet3D" or model.startswith("VideoConvNet")


def sample_input(model: str, channel: int, im_size, frames: int,
                 batch: int = 2):
    if is_video_model(model):
        return jnp.zeros((batch, frames, im_size[0], im_size[1], channel),
                         jnp.float32)
    return jnp.zeros((batch, im_size[0], im_size[1], channel), jnp.float32)


def init_model(model_def, rng, x):
    """Initialise a model; returns (params, extra_variables).

    ``extra_variables`` holds e.g. batch_stats for BatchNorm nets (empty dict
    for the default norm-free / groupnorm nets).
    """
    variables = model_def.init({"params": rng, "dropout": rng}, x, train=False)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    return params, extra


def get_eval_pool(eval_mode: str, model: str, model_eval: str | None = None):
    """Parity with utils.py:973-996."""
    model_eval = model_eval or model
    if eval_mode == "M":
        return ["MLP", "ConvNet", "LeNet", "AlexNet", "VGG11", "ResNet18"]
    if eval_mode == "B":
        return ["ConvNetBN", "ConvNetASwishBN", "AlexNetBN", "VGG11BN",
                "ResNet18BN"]
    if eval_mode == "W":
        return ["ConvNetW32", "ConvNetW64", "ConvNetW128", "ConvNetW256"]
    if eval_mode == "D":
        return ["ConvNetD1", "ConvNetD2", "ConvNetD3", "ConvNetD4"]
    if eval_mode == "A":
        return ["ConvNetAS", "ConvNetAR", "ConvNetAL", "ConvNetASwish"]
    if eval_mode == "P":
        return ["ConvNetNP", "ConvNetMP", "ConvNetAP"]
    if eval_mode == "N":
        return ["ConvNetNN", "ConvNetBN", "ConvNetLN", "ConvNetIN",
                "ConvNetGN"]
    if eval_mode == "S":
        return [model[: model.index("BN")]] if "BN" in model else [model]
    if eval_mode == "SS":
        return [model]
    # 'top5' and anything else: evaluate the given model (utils.py:994-995)
    return [model_eval]
