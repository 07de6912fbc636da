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

TPU notes: the input half of every cell's projections is **hoisted out of
the scan** — ``precompute`` runs ``x @ W_x`` for all L time steps as one
large MXU matmul at full utilization, so the sequential scan body only
contains the genuinely recurrent ``h @ W_h`` half (K drops from in+h to h
per step; the math is identical because the TF cells' single concat kernel
``[x, h] @ W`` distributes as ``x @ W[:in] + h @ W[in:]``).  Parameter
names and shapes keep the TF concat layout ([(in+h), gates]) so checkpoints
and the TF1 importer are unaffected.  Question lengths are <= ~45, so the
scan is short; bucketed static shapes avoid recompiles.

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


def _mm(x, w):
    """f32-accumulated matmul in the input dtype (params are f32)."""
    return jnp.dot(x, w.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)


class _CellBase(nn.Module):
    """Shared scaffolding: every cell declares its parameters in ``setup``
    (so ``precompute`` and ``step`` can share them), exposes

      * ``precompute(x)``  — the input-projection half, batched over any
        leading axes (one big MXU matmul when x is [B, L, D]);
      * ``step(carry, pre)`` — the sequential half;
      * ``__call__(carry, x)`` — single-step compatibility wrapper.

    ``in_dim`` must be set whenever the module is actually bound (params
    depend on it); the default -1 supports unbound helper calls like
    ``initial_carry``.
    """

    def _check_in_dim(self):
        if self.in_dim < 0:
            raise ValueError(
                f"{type(self).__name__} needs in_dim= to create parameters "
                "(pass it via make_cell)")

    def __call__(self, carry, x):
        return self.step(carry, self.precompute(x))


class LSTMCell(_CellBase):
    """TF BasicLSTMCell semantics (reference uses it via ops.py:765)."""
    features: int
    in_dim: int = -1
    forget_bias: float = 1.0
    act: Optional[str] = None
    cfg: Optional[Config] = None

    def setup(self):
        self._check_in_dim()
        self.kernel_w = self.param(
            "kernel_w", nn.initializers.glorot_uniform(),
            (self.in_dim + self.features, 4 * self.features), jnp.float32)
        self.kernel_b = self.param(
            "kernel_b", nn.initializers.constant(0.0),
            (4 * self.features,), jnp.float32)

    def precompute(self, x):
        return _mm(x, self.kernel_w[:self.in_dim]) + self.kernel_b.astype(
            x.dtype)

    def step(self, carry, pre):
        c, h = carry
        act = _cell_act(self.act, self.cfg)
        z = pre + _mm(h, self.kernel_w[self.in_dim:])
        i, j, f, o = jnp.split(z, 4, axis=-1)
        new_c = (c * jax.nn.sigmoid(f + self.forget_bias)
                 + jax.nn.sigmoid(i) * act(j))
        new_h = act(new_c) * jax.nn.sigmoid(o)
        return (new_c, new_h), new_h

    def initial_carry(self, batch, dtype):
        z = jnp.zeros((batch, self.features), dtype)
        return (z, z)


class GRUCell(_CellBase):
    """TF GRUCell semantics (gate bias init 1.0)."""
    features: int
    in_dim: int = -1
    act: Optional[str] = None
    cfg: Optional[Config] = None

    def setup(self):
        self._check_in_dim()
        d, D = self.features, self.in_dim
        self.gates_w = self.param("gates_w", nn.initializers.glorot_uniform(),
                                  (D + d, 2 * d), jnp.float32)
        self.gates_b = self.param("gates_b", nn.initializers.constant(1.0),
                                  (2 * d,), jnp.float32)
        self.candidate_w = self.param(
            "candidate_w", nn.initializers.glorot_uniform(), (D + d, d),
            jnp.float32)
        self.candidate_b = self.param(
            "candidate_b", nn.initializers.constant(0.0), (d,), jnp.float32)

    def precompute(self, x):
        D = self.in_dim
        gx = _mm(x, self.gates_w[:D]) + self.gates_b.astype(x.dtype)
        cx = _mm(x, self.candidate_w[:D]) + self.candidate_b.astype(x.dtype)
        return gx, cx

    def step(self, carry, pre):
        h = carry
        gx, cx = pre
        act = _cell_act(self.act, self.cfg)
        D = self.in_dim
        gates = jax.nn.sigmoid(gx + _mm(h, self.gates_w[D:]))
        r, u = jnp.split(gates, 2, axis=-1)
        c = act(cx + _mm(r * h, self.candidate_w[D:]))
        new_h = u * h + (1.0 - u) * c
        return new_h, new_h

    def initial_carry(self, batch, dtype):
        return jnp.zeros((batch, self.features), dtype)


class BasicRNNCell(_CellBase):
    """TF BasicRNNCell semantics."""
    features: int
    in_dim: int = -1
    act: Optional[str] = None
    cfg: Optional[Config] = None

    def setup(self):
        self._check_in_dim()
        self.kernel_w = self.param(
            "kernel_w", nn.initializers.glorot_uniform(),
            (self.in_dim + self.features, self.features), jnp.float32)
        self.kernel_b = self.param("kernel_b", nn.initializers.constant(0.0),
                                   (self.features,), jnp.float32)

    def precompute(self, x):
        return _mm(x, self.kernel_w[:self.in_dim]) + self.kernel_b.astype(
            x.dtype)

    def step(self, carry, pre):
        h = carry
        act = _cell_act(self.act, self.cfg)
        new_h = act(pre + _mm(h, self.kernel_w[self.in_dim:]))
        return new_h, new_h

    def initial_carry(self, batch, dtype):
        return jnp.zeros((batch, self.features), dtype)


class _MiBase(_CellBase):
    """Multiplicative-integration combine:
    beta1*Wx + beta2*Uh + beta3*(Wx*Uh) + b (reference: mi_gru_cell.py:26-37).
    Per-gate x-side kernels (Wx*) are stored separately (importer contract)
    but applied as one concatenated matmul in ``precompute``."""

    def _declare_gate(self, name: str):
        d = self.features
        setattr(self, f"_{name}_bias",
                self.param(f"{name}_bias", nn.initializers.zeros, (d,),
                           jnp.float32))
        setattr(self, f"_{name}_beta",
                self.param(f"{name}_beta", nn.initializers.ones, (3 * d,),
                           jnp.float32))

    def _declare_w(self, name: str, in_dim: int):
        setattr(self, f"_{name}_w",
                self.param(f"{name}_w", nn.initializers.glorot_uniform(),
                           (in_dim, self.features), jnp.float32))

    def _mi(self, name, wx, uh, b_initial: float = 0.0):
        b = (getattr(self, f"_{name}_bias").astype(wx.dtype)
             + jnp.asarray(b_initial, wx.dtype))
        beta = getattr(self, f"_{name}_beta").astype(wx.dtype)
        b1, b2, b3 = jnp.split(beta, 3)
        return b1 * wx + b2 * uh + b3 * (wx * uh) + b

    def _wx_all(self, x, names):
        """One concatenated x-projection matmul for all gates."""
        w = jnp.concatenate([getattr(self, f"_{n}_w") for n in names],
                            axis=1)
        return jnp.split(_mm(x, w), len(names), axis=-1)


class MiGRUCell(_MiBase):
    """Multiplicative-integration GRU (reference: mi_gru_cell.py:4-63)."""
    features: int
    in_dim: int = -1
    act: Optional[str] = None
    cfg: Optional[Config] = None

    def setup(self):
        self._check_in_dim()
        for n in ("Wxr", "Wxu", "Wxl"):
            self._declare_w(n, self.in_dim)
        for n in ("Uhr", "Uhu", "Uhl"):
            self._declare_w(n, self.features)
        self._declare_gate("r")
        self._declare_gate("u")
        self._declare_gate("c")

    def precompute(self, x):
        return tuple(self._wx_all(x, ("Wxr", "Wxu", "Wxl")))

    def step(self, carry, pre):
        h = carry
        act = _cell_act(self.act, self.cfg)
        wxr, wxu, wxl = pre
        r = jax.nn.sigmoid(self._mi("r", wxr, _mm(h, self._Uhr_w), 1.0))
        u = jax.nn.sigmoid(self._mi("u", wxu, _mm(h, self._Uhu_w), 1.0))
        c = act(self._mi("c", wxl, _mm(r * h, self._Uhl_w)))
        new_h = u * h + (1.0 - u) * c
        return new_h, new_h

    def initial_carry(self, batch, dtype):
        return jnp.zeros((batch, self.features), dtype)


class MiLSTMCell(_MiBase):
    """Multiplicative-integration LSTM (reference: mi_lstm_cell.py:4-76)."""
    features: int
    in_dim: int = -1
    forget_bias: float = 1.0
    act: Optional[str] = None
    cfg: Optional[Config] = None

    def setup(self):
        self._check_in_dim()
        for n in ("Wxi", "Wxj", "Wxf", "Wxo"):
            self._declare_w(n, self.in_dim)
        for n in ("Uhi", "Uhj", "Uhf", "Uho"):
            self._declare_w(n, self.features)
        for n in ("i", "j", "f", "o"):
            self._declare_gate(n)

    def precompute(self, x):
        return tuple(self._wx_all(x, ("Wxi", "Wxj", "Wxf", "Wxo")))

    def step(self, carry, pre):
        c, h = carry
        act = _cell_act(self.act, self.cfg)
        wxi, wxj, wxf, wxo = pre
        i = self._mi("i", wxi, _mm(h, self._Uhi_w))
        j = self._mi("j", wxj, _mm(h, self._Uhj_w))
        f = self._mi("f", wxf, _mm(h, self._Uhf_w))
        o = self._mi("o", wxo, _mm(h, self._Uho_w))
        new_c = (c * jax.nn.sigmoid(f + self.forget_bias)
                 + jax.nn.sigmoid(i) * act(j))
        new_h = act(new_c) * jax.nn.sigmoid(o)
        return (new_c, new_h), new_h

    def initial_carry(self, batch, dtype):
        z = jnp.zeros((batch, self.features), dtype)
        return (z, z)


class ProjLSTMCell(_CellBase):
    """LSTM with a learned projection of the hidden state (TF LSTMCell
    num_proj; reference createCell 'ProjLSTM' branch, ops.py:755-760)."""
    features: int
    in_dim: int = -1
    proj_dim: Optional[int] = None
    forget_bias: float = 1.0
    act: Optional[str] = None
    cfg: Optional[Config] = None

    def setup(self):
        self._check_in_dim()
        proj = self.proj_dim or self.features
        # state h is the projected state (TF num_proj), so the recurrent
        # half of the kernel has K = proj
        self.kernel_w = self.param(
            "kernel_w", nn.initializers.glorot_uniform(),
            (self.in_dim + proj, 4 * self.features), jnp.float32)
        self.kernel_b = self.param(
            "kernel_b", nn.initializers.constant(0.0),
            (4 * self.features,), jnp.float32)
        self.proj_w = self.param(
            "proj_w", nn.initializers.glorot_uniform(),
            (self.features, proj), jnp.float32)

    def precompute(self, x):
        return _mm(x, self.kernel_w[:self.in_dim]) + self.kernel_b.astype(
            x.dtype)

    def step(self, carry, pre):
        c, h = carry
        act = _cell_act(self.act, self.cfg)
        z = pre + _mm(h, self.kernel_w[self.in_dim:])
        i, j, f, o = jnp.split(z, 4, axis=-1)
        new_c = (c * jax.nn.sigmoid(f + self.forget_bias)
                 + jax.nn.sigmoid(i) * act(j))
        new_h = _mm(act(new_c) * jax.nn.sigmoid(o), self.proj_w)
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
              act: Optional[str] = None, name: Optional[str] = None,
              in_dim: int = -1):
    """Cell factory (reference: ops.py:749-772)."""
    cls = CELL_TYPES[cell_type]
    return cls(features=features, in_dim=in_dim, act=act, cfg=cfg, name=name)


def initial_carry(cell_type: str, features: int, batch: int, dtype,
                  proj_dim: Optional[int] = None):
    """Zero state for a cell type, without instantiating the module (module
    creation inside a compact parent would bind it and demand in_dim)."""
    z = jnp.zeros((batch, features), dtype)
    if cell_type in ("LSTM", "MiLSTM"):
        return (z, z)
    if cell_type == "ProjLSTM":
        return (z, jnp.zeros((batch, proj_dim or features), dtype))
    return z


def reverse_sequence(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """tf.reverse_sequence: reverse each row within its valid length,
    keeping padding in place.  x: [B, L, ...]."""
    L = x.shape[1]
    t = jnp.arange(L)[None, :]
    idx = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    idx = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)


class _MaskedStep(nn.Module):
    """The scanned recurrence body: run the cell's sequential half on the
    precomputed input projections, freeze state and zero output past the
    sequence length; apply (optional) variational state dropout.

    ``precompute`` is NOT scanned (nn.scan methods=["step"]) — it runs the
    batched input-projection matmul once for all L steps."""
    cell_type: str
    features: int
    cfg: Config
    in_dim: int
    act: Optional[str] = None

    def setup(self):
        self.cell = make_cell(self.cell_type, self.features, self.cfg,
                              self.act, in_dim=self.in_dim, name="cell")

    def precompute(self, xs):
        return self.cell.precompute(xs)

    def step(self, carry, inp):
        pre, valid = inp                     # pre: pytree [B, ...]; [B, 1]
        state, st_mask = carry
        new_state, out = self.cell.step(state, pre)
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
        return (new_state, st_mask), out


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
        if in_mask is not None:
            # variational input mask is constant over time and multiplies x
            # before a linear map, so applying it pre-hoist is exact
            xs = xs * in_mask.astype(xs.dtype)[:, None, :]

        valid = (jnp.arange(L)[None, :] < lengths[:, None])[..., None]  # [B,L,1]

        scan = nn.scan(
            _MaskedStep,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1, out_axes=1,
            methods=["step"])
        mod = scan(self.cell_type, self.features, self.cfg, D, self.act,
                   name="scan")
        pre = mod.precompute(xs)             # one batched matmul over [B, L]
        init = initial_carry(self.cell_type, self.features, B, xs.dtype)
        (final_state, _), outs = mod.step((init, st_mask), (pre, valid))
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
                         self.cfg.stemGridAct, name="cell",
                         in_dim=f.shape[-1])
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
