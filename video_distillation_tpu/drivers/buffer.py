"""Expert-buffer generation driver (TPU rebuild of
``/root/reference/buffer.py`` + ``sh/baseline/buffer.sh``)."""

from __future__ import annotations

import argparse
import dataclasses

from ..config import BufferConfig
from ..distill.buffer import generate_buffers
from ..utils.logging import MetricLogger
from .common import load_data


def main(argv=None):
    from ..parallel.mesh import ensure_platform_env

    ensure_platform_env()  # honor JAX_PLATFORMS despite the axon config pin
    p = argparse.ArgumentParser(description="Expert buffer generation")
    for f in dataclasses.fields(BufferConfig):
        if isinstance(f.default, bool):
            p.add_argument(f"--{f.name}", type=lambda s: s.lower() == "true",
                           default=None)
        else:
            p.add_argument(f"--{f.name}", type=type(f.default), default=None)
    args = p.parse_args(argv)
    cfg = BufferConfig()
    for f in dataclasses.fields(BufferConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            setattr(cfg, f.name, v)

    data = load_data(cfg)
    logger = MetricLogger(log_dir=cfg.buffer_path,
                          run_name=f"buffer_{cfg.dataset}")

    def progress(it, acc):
        logger.log({"expert": it, "train_acc": acc})

    paths = generate_buffers(data, cfg, progress)
    logger.log({"buffers_written": len(paths)})
    logger.finish()


if __name__ == "__main__":
    main()
