"""Recurrent layers via masked ``lax.scan`` (reference: ops.py:727-1000,
mi_gru_cell.py, mi_lstm_cell.py).

TF-semantics parity:
  * ``dynamic_rnn`` zeroes outputs past each sequence length and freezes the
    state there (the final state is the state at t = length); both behaviors
    are reproduced by the masked scan step.
  * ``bidirectional_dynamic_rnn`` reverses each sequence *within its valid
    length* (tf reverse_sequence), runs the forward cell, and re-reverses
    the outputs — implemented by ``reverse_sequence``.
  * LSTM = TF BasicLSTMCell (forget_bias 1.0 added pre-sigmoid, tanh state
    activation); GRU = TF GRUCell (gate bias init 1.0); MiGRU / MiLSTM are
    the multiplicative-integration cells (mi_gru_cell.py:26-60,
    mi_lstm_cell.py:27-72).
  * Variational dropout (DropoutWrapper variational_recurrent=True,
    ops.py:806-810): one input mask and one state mask per batch, reused at
    every time step; the state mask applies to the hidden output h only.

TPU notes: each scan step is a single [B, in+h] x [in+h, 4h] MXU matmul;
params are broadcast across the scan (compiled once).  Question lengths are
<= ~45, so the scan is short; bucketed static shapes avoid recompiles.

Deviations (documented): the reference's grid-RNN path (ops.py:956-1000)
is non-functional dead code — ``multigridRNNLayer`` returns an undefined
variable (ops.py:968) and the cell is invoked with features as "state",
which cannot type-check.  We provide a working 4-direction grid RNN with
the evidently intended semantics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mac_network_tpu.config import Config
from mac_network_tpu.ops.activations import apply_act_fn


def _cell_act(kind: Optional[str], cfg: Config):
    if kind is None or kind == "TANH":
        return jnp.tanh
    if kind == "NON":
        return lambda x: x
    if kind == "RELU":
        return jax.nn.relu
    return lambda x: apply_act_fn(kind, x, cfg)


def _dense(mod, name, x, out_dim, bias_init=None):
    """Plain matmul param helper for cells (f32 params, x-dtype compute)."""
    w = mod.param(name + "_w", nn.initializers.glorot_uniform(),
                  (x.shape[-1], out_dim), jnp.float32)
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32
                ).astype(x.dtype)
    if bias_init is not None:
        b = mod.param(name + "_b", nn.initializers.constant(bias_init),
                      (out_dim,), jnp.float32)
        y = y + b.astype(x.dtype)
    return y


class LSTMCell(nn.Module):
    """TF BasicLSTMCell semantics (reference uses it via ops.py:765)."""
    features: int
    forget_bias: float = 1.0
    act: Optional[str] = None
    cfg: Optional[Config] = None

    @nn.compact
    def __call__(self, carry, x):
        c, h = carry
        act = _cell_act(self.act, self.cfg)
        z = _dense(self, "kernel", jnp.concatenate([x, h], -1),
                   4 * self.features, bias_init=0.0)
        i, j, f, o = jnp.split(z, 4, axis=-1)
        new_c = (c * jax.nn.sigmoid(f + self.forget_bias)
                 + jax.nn.sigmoid(i) * act(j))
        new_h = act(new_c) * jax.nn.sigmoid(o)
        return (new_c, new_h), new_h

    def initial_carry(self, batch, dtype):
        z = jnp.zeros((batch, self.features), dtype)
        return (z, z)


class GRUCell(nn.Module):
    """TF GRUCell semantics (gate bias init 1.0)."""
    features: int
    act: Optional[str] = None
    cfg: Optional[Config] = None

    @nn.compact
    def __call__(self, carry, x):
        h = carry
        act = _cell_act(self.act, self.cfg)
        xh = jnp.concatenate([x, h], -1)
        gates = jax.nn.sigmoid(_dense(self, "gates", xh, 2 * self.features,
                                      bias_init=1.0))
        r, u = jnp.split(gates, 2, axis=-1)
        c = act(_dense(self, "candidate", jnp.concatenate([x, r * h], -1),
                       self.features, bias_init=0.0))
        new_h = u * h + (1.0 - u) * c
        return new_h, new_h

    def initial_carry(self, batch, dtype):
        return jnp.zeros((batch, self.features), dtype)


class BasicRNNCell(nn.Module):
    """TF BasicRNNCell semantics."""
    features: int
    act: Optional[str] = None
    cfg: Optional[Config] = None

    @nn.compact
    def __call__(self, carry, x):
        h = carry
        act = _cell_act(self.act, self.cfg)
        new_h = act(_dense(self, "kernel", jnp.concatenate([x, h], -1),
                           self.features, bias_init=0.0))
        return new_h, new_h

    def initial_carry(self, batch, dtype):
        return jnp.zeros((batch, self.features), dtype)


class _MiMixin:
    """Multiplicative-integration combine:
    beta1*Wx + beta2*Uh + beta3*(Wx*Uh) + b (reference: mi_gru_cell.py:26-37)."""

    def _mi(self, name, wx, uh, dim, b_initial=0.0):
        b = self.param(f"{name}_bias", nn.initializers.zeros, (dim,),
                       jnp.float32).astype(wx.dtype) + jnp.asarray(
                           b_initial, wx.dtype)
        beta = self.param(f"{name}_beta", nn.initializers.ones, (3 * dim,),
                          jnp.float32).astype(wx.dtype)
        b1, b2, b3 = jnp.split(beta, 3)
        return b1 * wx + b2 * uh + b3 * (wx * uh) + b


class MiGRUCell(nn.Module, _MiMixin):
    """Multiplicative-integration GRU (reference: mi_gru_cell.py:4-63)."""
    features: int
    act: Optional[str] = None
    cfg: Optional[Config] = None

    @nn.compact
    def __call__(self, carry, x):
        h = carry
        act = _cell_act(self.act, self.cfg)
        d = self.features
        r = jax.nn.sigmoid(self._mi("r", _dense(self, "Wxr", x, d),
                                    _dense(self, "Uhr", h, d), d, 1.0))
        u = jax.nn.sigmoid(self._mi("u", _dense(self, "Wxu", x, d),
                                    _dense(self, "Uhu", h, d), d, 1.0))
        c = act(self._mi("c", _dense(self, "Wxl", x, d),
                         _dense(self, "Uhl", r * h, d), d))
        new_h = u * h + (1.0 - u) * c
        return new_h, new_h

    def initial_carry(self, batch, dtype):
        return jnp.zeros((batch, self.features), dtype)


class MiLSTMCell(nn.Module, _MiMixin):
    """Multiplicative-integration LSTM (reference: mi_lstm_cell.py:4-76)."""
    features: int
    forget_bias: float = 1.0
    act: Optional[str] = None
    cfg: Optional[Config] = None

    @nn.compact
    def __call__(self, carry, x):
        c, h = carry
        act = _cell_act(self.act, self.cfg)
        d = self.features
        i = self._mi("i", _dense(self, "Wxi", x, d), _dense(self, "Uhi", h, d), d)
        j = self._mi("j", _dense(self, "Wxj", x, d), _dense(self, "Uhj", h, d), d)
        f = self._mi("f", _dense(self, "Wxf", x, d), _dense(self, "Uhf", h, d), d)
        o = self._mi("o", _dense(self, "Wxo", x, d), _dense(self, "Uho", h, d), d)
        new_c = c * jax.nn.sigmoid(f + self.forget_bias) + jax.nn.sigmoid(i) * act(j)
        new_h = act(new_c) * jax.nn.sigmoid(o)
        return (new_c, new_h), new_h

    def initial_carry(self, batch, dtype):
        z = jnp.zeros((batch, self.features), dtype)
        return (z, z)


class ProjLSTMCell(nn.Module):
    """LSTM with a learned projection of the hidden state (TF LSTMCell
    num_proj; reference createCell 'ProjLSTM' branch, ops.py:755-760)."""
    features: int
    proj_dim: Optional[int] = None
    forget_bias: float = 1.0
    act: Optional[str] = None
    cfg: Optional[Config] = None

    @nn.compact
    def __call__(self, carry, x):
        c, h = carry
        act = _cell_act(self.act, self.cfg)
        proj = self.proj_dim or self.features
        z = _dense(self, "kernel", jnp.concatenate([x, h], -1),
                   4 * self.features, bias_init=0.0)
        i, j, f, o = jnp.split(z, 4, axis=-1)
        new_c = (c * jax.nn.sigmoid(f + self.forget_bias)
                 + jax.nn.sigmoid(i) * act(j))
        new_h = _dense(self, "proj", act(new_c) * jax.nn.sigmoid(o), proj)
        return (new_c, new_h), new_h

    def initial_carry(self, batch, dtype):
        proj = self.proj_dim or self.features
        return (jnp.zeros((batch, self.features), dtype),
                jnp.zeros((batch, proj), dtype))


CELL_TYPES = {
    "RNN": BasicRNNCell,
    "GRU": GRUCell,
    "LSTM": LSTMCell,
    "MiGRU": MiGRUCell,
    "MiLSTM": MiLSTMCell,
    "ProjLSTM": ProjLSTMCell,
}


def make_cell(cell_type: str, features: int, cfg: Config,
              act: Optional[str] = None, name: Optional[str] = None):
    """Cell factory (reference: ops.py:749-772)."""
    cls = CELL_TYPES[cell_type]
    return cls(features=features, act=act, cfg=cfg, name=name)


def reverse_sequence(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """tf.reverse_sequence: reverse each row within its valid length,
    keeping padding in place.  x: [B, L, ...]."""
    L = x.shape[1]
    t = jnp.arange(L)[None, :]
    idx = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    idx = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)


class _MaskedStep(nn.Module):
    """One masked scan step: run the cell, freeze state and zero output past
    the sequence length; apply (optional) variational dropout masks."""
    cell_type: str
    features: int
    cfg: Config
    act: Optional[str] = None
    state_keep: float = 1.0

    @nn.compact
    def __call__(self, carry, inp):
        x, valid = inp                       # x: [B, D]; valid: [B, 1] bool
        state, in_mask, st_mask = carry
        if in_mask is not None:
            x = x * in_mask.astype(x.dtype)
        cell = make_cell(self.cell_type, self.features, self.cfg, self.act,
                         name="cell")
        new_state, out = cell(state, x)
        if st_mask is not None:
            # state dropout applies to h only (TF DropoutWrapper filter)
            if isinstance(new_state, tuple):
                c, h = new_state
                new_state = (c, h * st_mask.astype(h.dtype))
                out = out * st_mask.astype(out.dtype)
            else:
                new_state = new_state * st_mask.astype(new_state.dtype)
                out = out * st_mask.astype(out.dtype)
        sel = lambda n, o: jnp.where(valid, n, o)
        new_state = jax.tree.map(sel, new_state, state)
        out = jnp.where(valid, out, jnp.zeros_like(out))
        return (new_state, in_mask, st_mask), out


class _UniRNN(nn.Module):
    """Forward RNN over a padded batch (reference fwRNNLayer,
    ops.py:798-833)."""
    cell_type: str
    features: int
    cfg: Config
    act: Optional[str] = None
    dropout: float = 1.0                   # input keep-prob (non-variational)
    var_dp: bool = False
    var_input_keep: float = 1.0
    var_state_keep: float = 1.0

    @nn.compact
    def __call__(self, xs: jnp.ndarray, lengths: jnp.ndarray,
                 train: bool = False):
        B, L, D = xs.shape
        in_mask = st_mask = None
        if self.var_dp and train:
            rng = self.make_rng("dropout")
            k1, k2 = jax.random.split(rng)
            if self.var_input_keep < 1.0:
                in_mask = (jax.random.bernoulli(k1, self.var_input_keep,
                                                (B, D)).astype(jnp.float32)
                           / self.var_input_keep)
            if self.var_state_keep < 1.0:
                st_mask = (jax.random.bernoulli(k2, self.var_state_keep,
                                                (B, self.features)
                                                ).astype(jnp.float32)
                           / self.var_state_keep)
        elif self.dropout < 1.0:
            xs = nn.Dropout(rate=1.0 - self.dropout,
                            deterministic=not train)(xs)

        valid = (jnp.arange(L)[None, :] < lengths[:, None])[..., None]  # [B,L,1]

        scan = nn.scan(
            _MaskedStep,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1, out_axes=1)
        step = scan(self.cell_type, self.features, self.cfg, self.act,
                    name="scan")
        cell = CELL_TYPES[self.cell_type](features=self.features)
        init = cell.initial_carry(B, xs.dtype)
        (final_state, _, _), outs = step((init, in_mask, st_mask),
                                         (xs, valid))
        final_h = final_state[1] if isinstance(final_state, tuple) else final_state
        return outs, final_h


class RNNLayer(nn.Module):
    """RNN dispatcher (reference: ops.py:940-952): bidirectional halves the
    hidden dim per direction and concatenates outputs and final states
    (biRNNLayer, ops.py:859-911)."""
    features: int
    cfg: Config
    bi: Optional[bool] = None
    cell_type: Optional[str] = None
    dropout: float = 1.0
    var_dp: bool = False
    var_input_keep: float = 1.0
    var_state_keep: float = 1.0

    @nn.compact
    def __call__(self, xs: jnp.ndarray, lengths: jnp.ndarray,
                 train: bool = False):
        cfg = self.cfg
        bi = cfg.encBi if self.bi is None else self.bi
        cell_type = self.cell_type or cfg.encType
        h_dim = self.features // 2 if bi else self.features
        kw = dict(cell_type=cell_type, features=h_dim, cfg=cfg,
                  dropout=self.dropout, var_dp=self.var_dp,
                  var_input_keep=self.var_input_keep,
                  var_state_keep=self.var_state_keep)
        if not bi:
            return _UniRNN(**kw, name="fw")(xs, lengths, train)
        out_fw, h_fw = _UniRNN(**kw, name="fw")(xs, lengths, train)
        xs_rev = reverse_sequence(xs, lengths)
        out_bw, h_bw = _UniRNN(**kw, name="bw")(xs_rev, lengths, train)
        out_bw = reverse_sequence(out_bw, lengths)
        return (jnp.concatenate([out_fw, out_bw], -1),
                jnp.concatenate([h_fw, h_bw], -1))


class _GridColStep(nn.Module):
    """One cell update at grid position (i, j): merge the up/left neighbor
    states into the cell state, feed the local feature as input."""
    features: int
    cfg: Config

    @nn.compact
    def __call__(self, left, inp):
        from mac_network_tpu.ops.linear import Linear
        up, f = inp                               # [B, d], [B, D]
        state_in = Linear(self.features, self.cfg, name="merge")(
            jnp.concatenate([up, left], -1))
        cell = make_cell(self.cfg.stemGridRnnMod, self.features, self.cfg,
                         self.cfg.stemGridAct, name="cell")
        carry = state_in
        new_carry, _ = cell(carry, f)
        new_h = new_carry[1] if isinstance(new_carry, tuple) else new_carry
        return new_h, new_h


class _GridRowStep(nn.Module):
    """Scan one row left-to-right, given the previous row's states."""
    features: int
    cfg: Config

    @nn.compact
    def __call__(self, prev_row, row_feats):
        # prev_row: [B, W, d]; row_feats: [B, W, D]
        B, W, _ = row_feats.shape
        colscan = nn.scan(
            _GridColStep, variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1, out_axes=1)
        left0 = jnp.zeros((B, self.features), row_feats.dtype)
        _, row_states = colscan(self.features, self.cfg, name="col")(
            left0, (prev_row, row_feats))
        return row_states, row_states


class GridRNN(nn.Module):
    """Working 4-direction 2-D grid RNN over the image feature map
    (intended semantics of reference ops.py:956-1000; the reference code
    itself is non-functional — see module docstring).

    state(i, j) = cell(input=features[i, j],
                       state=Linear(concat(state(i-1, j), state(i, j-1))))
    run in all four scan orders, outputs concatenated then projected.
    """
    features: int
    cfg: Config

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from mac_network_tpu.ops.linear import Linear
        d = self.features
        outs = []
        for name, (flip_h, flip_w) in (("rd", (False, False)),
                                       ("r", (False, True)),
                                       ("d", (True, False)),
                                       ("n", (True, True))):
            feats = x
            if flip_h:
                feats = feats[:, ::-1]
            if flip_w:
                feats = feats[:, :, ::-1]
            B, H, W, _ = feats.shape
            rowscan = nn.scan(
                _GridRowStep, variable_broadcast="params",
                split_rngs={"params": False, "dropout": True},
                in_axes=1, out_axes=1)
            row0 = jnp.zeros((B, W, d), feats.dtype)
            _, out = rowscan(d, self.cfg, name=f"grid_{name}")(row0, feats)
            if flip_h:
                out = out[:, ::-1]
            if flip_w:
                out = out[:, :, ::-1]
            outs.append(out)
        merged = jnp.concatenate(outs, axis=-1)
        return Linear(d, self.cfg, name="o")(merged, train)
