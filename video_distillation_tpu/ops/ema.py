"""EMA / AVG parameter tracking.

Parity with ``/root/reference/FRePo/lib/training/utils.py:51-169`` (EMA
with debiasing, uniform AVG). Pure pytree transforms.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class EMAState:
    decay: float
    count: int
    average: Any  # pytree
    debias: bool = True

    @staticmethod
    def init(params, decay: float = 0.995, debias: bool = True):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return EMAState(decay=decay, count=0, average=zeros, debias=debias)

    def update(self, params) -> "EMAState":
        d = self.decay
        new_avg = jax.tree.map(lambda a, p: d * a + (1 - d) * p,
                               self.average, params)
        return EMAState(decay=d, count=self.count + 1, average=new_avg,
                        debias=self.debias)

    def value(self):
        if not self.debias or self.count == 0:
            return self.average
        corr = 1.0 - self.decay ** self.count
        return jax.tree.map(lambda a: a / corr, self.average)


@dataclasses.dataclass
class AVGState:
    count: int
    average: Any

    @staticmethod
    def init(params):
        return AVGState(count=0,
                        average=jax.tree.map(jnp.zeros_like, params))

    def update(self, params) -> "AVGState":
        c = self.count + 1
        new_avg = jax.tree.map(lambda a, p: a + (p - a) / c, self.average,
                               params)
        return AVGState(count=c, average=new_avg)

    def value(self):
        return self.average
