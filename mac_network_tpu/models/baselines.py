"""Baseline models: CNN / LSTM / CNN+LSTM / stacked attention
(reference: model.py:327-393).

Deviations (documented): the reference's baselineAtt path calls an
undefined ``self.linear`` (model.py:373-374) and broadcasts the memory over
a rank-4 image tensor, which cannot type-check; the stacked-attention
baseline here implements the evident intent — flatten the image grid to
[B, H*W, d] and run additive/multiplicative attention layers over it.
Similarly ``linearizeFeatures`` uses an unassigned ``dim`` when projecting
(ops.py:606); fixed here.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mac_network_tpu.config import Config
from mac_network_tpu.ops.attention import Inter2Att, att2smry
from mac_network_tpu.ops.linear import Linear
from mac_network_tpu.ops.location import LinearizeFeatures
from mac_network_tpu.ops.mul import Mul


class BaselineAttLayer(nn.Module):
    """One stacked-attention layer: interact image cells with the memory,
    attend, and add the summary into the memory
    (reference: model.py:327-342)."""
    cfg: Config
    h_dim: int

    @nn.compact
    def __call__(self, images, memory, train: bool = False):
        cfg = self.cfg
        interactions, _ = Mul(
            cfg, inter_mod=cfg.baselineAttType, proj_dim=self.h_dim,
            proj_shared=False, name="inter")(images, memory, train)
        attention = Inter2Att(cfg, name="att")(interactions, train=train)
        summary = att2smry(attention, images)
        return memory + summary


class Baseline(nn.Module):
    """Baseline dispatcher (reference: model.py:370-393): stacked attention
    when baselineAtt, otherwise CNN and/or LSTM features."""
    cfg: Config

    @nn.compact
    def __call__(self, vec_questions, images, train: bool = False):
        cfg = self.cfg
        if cfg.baselineAtt:
            h = cfg.attDim
            memory = Linear(h, cfg, name="qProj")(vec_questions, train)
            B = images.shape[0]
            flat = images.reshape(B, -1, images.shape[-1])
            flat = Linear(h, cfg, name="iProj")(flat, train)
            for i in range(cfg.baselineAttNumLayers):
                memory = BaselineAttLayer(cfg, h, name=f"baseline{i}")(
                    flat, memory, train)
            return memory

        img = LinearizeFeatures(cfg, proj_dim=cfg.baselineProjDim,
                                name="linImage")(images, train)
        if cfg.baselineLSTM and cfg.baselineCNN:
            return jnp.concatenate([vec_questions, img], axis=-1)
        if cfg.baselineLSTM:
            return vec_questions
        return img  # baselineCNN
