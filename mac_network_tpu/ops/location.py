"""Positional encodings for the image grid (reference: ops.py:440-624).

Off by default (``locationAware``, reference config.py:256), but part of the
flag surface: linear meshgrid features ("L", ops.py:448-457), transformer
sin/cos 2-D encodings ("PE", ops.py:466-488), four merge modes
(CNCT/ADD/MUL/LIN, ops.py:514-559), and image linearization with pooling
(ops.py:595-624).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from mac_network_tpu.config import Config
from mac_network_tpu.ops.linear import Linear
from mac_network_tpu.ops.activations import Act


def location_l(h: int, w: int, cfg: Config, dtype=jnp.float32) -> jnp.ndarray:
    """Linear meshgrid grid [h, w, 2] in [-locationBias, locationBias]
    (reference: ops.py:448-457)."""
    xs = jnp.linspace(-cfg.locationBias, cfg.locationBias, w, dtype=dtype)
    ys = jnp.linspace(-cfg.locationBias, cfg.locationBias, h, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx, gy], axis=-1)


def location_pe(h: int, w: int, dim: int, cfg: Config,
                dtype=jnp.float32) -> jnp.ndarray:
    """2-D sin/cos positional encoding [h, w, 4*dim]
    (reference: ops.py:466-488)."""
    x = jnp.linspace(-cfg.locationBias, cfg.locationBias, w,
                     dtype=dtype)[:, None]
    y = jnp.linspace(-cfg.locationBias, cfg.locationBias, h,
                     dtype=dtype)[:, None]
    i = jnp.arange(dim, dtype=dtype)[None, :]
    div = jnp.power(10000.0, i / dim)
    pe_sin_x = jnp.sin(x / div)            # [w, dim]
    pe_cos_x = jnp.cos(x / div)
    pe_sin_y = jnp.sin(y / div)            # [h, dim]
    pe_cos_y = jnp.cos(y / div)
    sx = jnp.tile(pe_sin_x[None], (h, 1, 1))
    cx = jnp.tile(pe_cos_x[None], (h, 1, 1))
    sy = jnp.tile(pe_sin_y[:, None], (1, w, 1))
    cy = jnp.tile(pe_cos_y[:, None], (1, w, 1))
    return jnp.concatenate([sx, cx, sy, cy], axis=-1)


class AddLocation(nn.Module):
    """Merge positional encoding into image features
    (reference: ops.py:514-559). mod in CNCT | ADD | MUL | LIN."""
    cfg: Config
    l_dim: int
    out_dim: int = -1
    loc_type: str = "L"
    mod: str = "CNCT"

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False):
        cfg = self.cfg
        B, h, w, dim = features.shape
        dtype = features.dtype

        def grid_raw():
            if self.loc_type == "PE":
                return location_pe(h, w, self.l_dim, cfg, dtype)
            return location_l(h, w, cfg, dtype)

        if self.mod == "LIN":
            out_dim = self.out_dim if self.out_dim > 0 else dim
            grid = Linear(out_dim, cfg, add_bias=False, name="locProj")(
                grid_raw(), train)
            features = Linear(out_dim, cfg, name="LIN")(features, train)
            return features + grid[None]

        if self.mod == "CNCT":
            grid = jnp.broadcast_to(grid_raw()[None],
                                    (B, h, w, grid_raw().shape[-1]))
            features = jnp.concatenate([features, grid], axis=-1)
        elif self.mod == "ADD":
            grid = Linear(dim, cfg, add_bias=False, name="locProj")(
                grid_raw(), train)
            features = features + grid[None]
        elif self.mod == "MUL":
            grid = Linear(dim, cfg, add_bias=False, name="locProj")(
                grid_raw(), train)
            grid = jnp.broadcast_to(grid[None], features.shape)
            features = jnp.concatenate(
                [features, grid, features * grid], axis=-1)

        if self.out_dim > 0:
            features = Linear(self.out_dim, cfg, name="outProj")(
                features, train)
        return features


class LinearizeFeatures(nn.Module):
    """Pool + flatten the image grid to a vector (reference: ops.py:595-624),
    used when feeding the image to the output unit / CNN baselines."""
    cfg: Config
    proj_dim: Optional[int] = None
    out_dim: Optional[int] = None
    pooling: Optional[int] = None

    @nn.compact
    def __call__(self, features: jnp.ndarray, train: bool = False):
        cfg = self.cfg
        pooling = self.pooling if self.pooling is not None else cfg.imageLinPool

        if self.proj_dim is not None:
            features = Linear(self.proj_dim, cfg, name="proj")(features, train)
            features = Act("RELU", cfg, name="act")(features)

        if pooling > 1:
            features = nn.max_pool(
                features, window_shape=(pooling, pooling),
                strides=(pooling, pooling), padding="SAME")

        B = features.shape[0]
        features = features.reshape(B, -1)

        if self.out_dim is not None:
            features = Linear(self.out_dim, cfg, name="out")(features, train)
        return features
