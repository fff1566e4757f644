"""Parameter initializers with torch-parity statistics.

Replaces the reference HeNorm initializer (reference models.py:17-35):
kaiming-normal (fan_in, ReLU gain) conv kernels with bias 0.01, unit BN
scale / zero BN bias, and torch-default Linear init. In flax these are
expressed as init functions wired into the modules rather than a post-hoc
module walk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.nn.initializers import constant, variance_scaling

# torch kaiming_normal_(mode='fan_in', nonlinearity='leaky_relu', a=0):
# std = sqrt(2 / fan_in)
kaiming_normal_conv = variance_scaling(2.0, "fan_in", "normal")

# torch nn.Linear.reset_parameters(): kaiming_uniform_(a=sqrt(5)) =>
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)); variance_scaling uniform limit is
# sqrt(3*scale/fan_in), so scale=1/3 reproduces it.
torch_linear_kernel = variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias(fan_in):
    """torch Linear bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class HeNorm:
    """Config-level initializer object (INITIALIZER={"method": "models.HeNorm"}).

    Exposes the kernel/bias init functions the model factories consume.
    """

    def __init__(self, mode="fan_in", **kwargs):
        self.mode = mode
        self.conv_kernel_init = variance_scaling(2.0, mode, "normal")
        self.conv_bias_init = constant(0.01)

    def __repr__(self):
        return f"HeNorm(mode={self.mode})"
