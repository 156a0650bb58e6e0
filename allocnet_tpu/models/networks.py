"""Time-allocation networks, pure JAX (flax.linen).

Re-implementations of the reference's models with EXACT torch weight layouts
so the shipped TorchScript checkpoints drop in unchanged
(models/import_torch.py):

  * ConvMLPAllocNet  == ConvMinimalSnapNetwork   (minsnap_network_conv.py:24-101)
  * ConvLSTMAllocNet == ConvLSTMMinimalSnapNetwork (minsnap_network_conv_lstm.py:25-111)

Design deltas from the reference (all TPU-motivated, none behavioral):
  * the autoregressive LSTM rollout is a jax.lax.scan over seq_len steps with
    stop-token masking, instead of a per-sample Python loop with `break`
    (minsnap_network_conv_lstm.py:253-321) — the entire batch rolls out in
    one fused program;
  * weights live in a plain parameter pytree shaped exactly like the torch
    state_dict (Linear: (out,in); Conv: OIHW; LSTM: (4h,in)/(4h,h) with
    i,f,g,o gate order), making checkpoint import a rename-free copy.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


# Kaiming-normal for TORCH-layout weights.  All parameters here keep the
# reference's (out, in) / (out_ch, in_ch, k...) layouts so shipped torch
# checkpoints import rename-free — but flax's kaiming_normal() defaults to
# in_axis=-2/out_axis=-1 (the (in, out) convention), which computes fan_in
# from the OUTPUT dimension.  Measured consequence before this fix: the MLP
# time head (5, 256) was initialized with fan_in=5 (std 13.8x too large),
# its pre-activations started at |x|~40, and whichever output slots landed
# in softplus's f32-underflow zone were born with exactly-zero gradient and
# never recovered (one dead segment slot => 0.67 time ratio forever).
_torch_linear_init = nn.initializers.variance_scaling(
    2.0, "fan_in", "truncated_normal", in_axis=-1, out_axis=-2)
_torch_conv_init = nn.initializers.variance_scaling(
    2.0, "fan_in", "truncated_normal", in_axis=1, out_axis=0)


def _linear(x, w, b):
    """torch nn.Linear: y = x @ W^T + b, W: (out, in). Params follow the
    input dtype (tests init under x64 while driving f32 inputs)."""
    return x @ w.T.astype(x.dtype) + b.astype(x.dtype)


class HpolyEncoder(nn.Module):
    """Corridor encoder (minsnap_network_conv_lstm.py:55-78): Conv2d(50->16,
    k3, pad 1) + ReLU + 2x MaxPool2d(2) + Linear(->32). Input (B, 50, 4, L)."""

    seq_len: int = 5

    @nn.compact
    def __call__(self, hpolys: jax.Array) -> jax.Array:
        flat_in = 16 if self.seq_len == 5 else 32
        w = self.param('conv_w', _torch_conv_init,
                       (16, 50, 3, 3))
        b = self.param('conv_b', nn.initializers.zeros, (16,))
        lw = self.param('lin_w', _torch_linear_init,
                        (32, flat_in))
        lb = self.param('lin_b', nn.initializers.zeros, (32,))

        x = jax.lax.conv_general_dilated(
            hpolys, w.astype(hpolys.dtype), window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
        x = x + b.astype(x.dtype)[None, :, None, None]
        x = jax.nn.relu(x)
        # two torch MaxPool2d(kernel=2, stride=2) with floor semantics
        for _ in range(2):
            B, C, H, W = x.shape
            Ho, Wo = H // 2, W // 2
            x = x[:, :, :Ho * 2, :Wo * 2].reshape(B, C, Ho, 2, Wo, 2).max((3, 5))
        x = x.reshape(x.shape[0], -1)
        return _linear(x, lw, lb)


class StateEncoder(nn.Module):
    """Start/end state encoder (minsnap_network_conv_lstm.py:82-88):
    Conv1d(9->8, k3, pad 1) + ReLU + MaxPool1d(2) + Linear(8->6).
    Input (B, 9, 2)."""

    @nn.compact
    def __call__(self, state: jax.Array) -> jax.Array:
        w = self.param('conv_w', _torch_conv_init, (8, 9, 3))
        b = self.param('conv_b', nn.initializers.zeros, (8,))
        lw = self.param('lin_w', _torch_linear_init, (6, 8))
        lb = self.param('lin_b', nn.initializers.zeros, (6,))

        x = jax.lax.conv_general_dilated(
            state[:, :, :, None], w.astype(state.dtype)[:, :, :, None],
            window_strides=(1, 1), padding=((1, 1), (0, 0)),
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'))[:, :, :, 0]
        x = jax.nn.relu(x + b.astype(x.dtype)[None, :, None])
        B, C, L = x.shape
        x = x[:, :, :(L // 2) * 2].reshape(B, C, L // 2, 2).max(-1)
        x = x.reshape(B, -1)
        return _linear(x, lw, lb)


def lstm_cell(x, h, c, w_ih, w_hh, b_ih, b_hh):
    """torch nn.LSTM single step; gate order i, f, g, o."""
    dt = x.dtype
    gates = (x @ w_ih.T.astype(dt) + b_ih.astype(dt)
             + h @ w_hh.T.astype(dt) + b_hh.astype(dt))
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


class ConvLSTMAllocNet(nn.Module):
    """Autoregressive LSTM time-allocation network with stop tokens
    (minsnap_network_conv_lstm.py:25-111).

    __call__ returns (times (B, T), stop_tokens (B, T)) after the reference's
    rollout-and-pad semantics: steps after the first stop-token > thresh get
    time 0 / token 1 (minsnap_network_conv_lstm.py:276-308)."""

    seq_len: int = 5
    hidden_size: int = 256
    token_thresh: float = 0.42

    def setup(self):
        self.hpoly_enc = HpolyEncoder(seq_len=self.seq_len)
        self.state_enc = StateEncoder()
        h, i = self.hidden_size, 38
        init = _torch_linear_init
        self.w_ih = self.param('w_ih', init, (4 * h, i))
        self.w_hh = self.param('w_hh', init, (4 * h, h))
        self.b_ih = self.param('b_ih', nn.initializers.zeros, (4 * h,))
        self.b_hh = self.param('b_hh', nn.initializers.zeros, (4 * h,))
        self.tf_w = self.param('tf_w', init, (1, h))
        self.tf_b = self.param('tf_b', nn.initializers.zeros, (1,))
        self.stop_w = self.param('stop_w', init, (1, h))
        self.stop_b = self.param('stop_b', nn.initializers.zeros, (1,))

    def embed(self, state: jax.Array, hpolys: jax.Array) -> jax.Array:
        return jnp.concatenate(
            [self.state_enc(state), self.hpoly_enc(hpolys)], axis=-1)

    def rollout(self, combined: jax.Array):
        """All seq_len LSTM steps (input constant per step, as the reference
        feeds the same embedding each iteration). Returns raw (tfs, stops)."""
        B = combined.shape[0]
        h0 = jnp.zeros((B, self.hidden_size), combined.dtype)
        c0 = jnp.zeros((B, self.hidden_size), combined.dtype)

        def step(carry, _):
            h, c = carry
            h, c = lstm_cell(combined, h, c, self.w_ih, self.w_hh,
                             self.b_ih, self.b_hh)
            tf = _linear(h, self.tf_w, self.tf_b)[:, 0]
            stop = jax.nn.sigmoid(_linear(h, self.stop_w, self.stop_b))[:, 0]
            return (h, c), (tf, stop)

        _, (tfs, stops) = jax.lax.scan(step, (h0, c0), None,
                                       length=self.seq_len)
        return tfs.T, stops.T          # (B, T)

    def __call__(self, state: jax.Array, hpolys: jax.Array,
                 token_thresh: float | None = None):
        thresh = self.token_thresh if token_thresh is None else token_thresh
        tfs, stops = self.rollout(self.embed(state, hpolys))
        # keep step k iff no stop token fired strictly before k; the firing
        # step itself is kept (the reference breaks AFTER appending)
        fired = stops > thresh
        before = jnp.cumsum(fired, axis=1) - fired.astype(jnp.int32)
        keep = (before == 0).astype(tfs.dtype)
        times = tfs * keep
        tokens = stops * keep + (1.0 - keep)
        return times, tokens


class ConvMLPAllocNet(nn.Module):
    """MLP-head variant (minsnap_network_conv.py:24-101): Linear-LayerNorm-
    ReLU-Dropout x2 -> Linear(hidden->seg) -> Softplus(beta=2)."""

    seg: int = 5
    seq_len: int = 5
    hidden_size: int = 128
    dropout: float = 0.2

    def setup(self):
        self.hpoly_enc = HpolyEncoder(seq_len=self.seq_len)
        self.state_enc = StateEncoder()
        init = _torch_linear_init
        h = self.hidden_size
        self.l1_w = self.param('l1_w', init, (h, 38))
        self.l1_b = self.param('l1_b', nn.initializers.zeros, (h,))
        self.ln1_s = self.param('ln1_s', nn.initializers.ones, (h,))
        self.ln1_b = self.param('ln1_b', nn.initializers.zeros, (h,))
        self.l2_w = self.param('l2_w', init, (h, h))
        self.l2_b = self.param('l2_b', nn.initializers.zeros, (h,))
        self.ln2_s = self.param('ln2_s', nn.initializers.ones, (h,))
        self.ln2_b = self.param('ln2_b', nn.initializers.zeros, (h,))
        self.l3_w = self.param('l3_w', init, (self.seg, h))
        # bias starts at 1.0, NOT 0: softplus(beta=2) has a dead zone below
        # ~-2 and a zero-initialized head lets early Adam steps push a slot's
        # pre-activation there permanently (measured: slot 0 saturated to
        # 7e-11s and its gradient to 0 while slots 1-3 fit exactly).  1.0
        # puts every slot at ~1.06 s — alive gradient at the time scale of
        # real segments.  Import parity is unaffected (loaded checkpoints
        # overwrite the init).
        self.l3_b = self.param('l3_b', nn.initializers.ones, (self.seg,))

    def _layernorm(self, x, s, b):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return ((x - mu) / jnp.sqrt(var + 1e-5) * s.astype(x.dtype)
                + b.astype(x.dtype))

    def __call__(self, state, hpolys, *, deterministic: bool = True):
        x = jnp.concatenate([self.state_enc(state), self.hpoly_enc(hpolys)],
                            axis=-1)
        x = jax.nn.relu(self._layernorm(_linear(x, self.l1_w, self.l1_b),
                                        self.ln1_s, self.ln1_b))
        if not deterministic:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        x = jax.nn.relu(self._layernorm(_linear(x, self.l2_w, self.l2_b),
                                        self.ln2_s, self.ln2_b))
        if not deterministic:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        x = _linear(x, self.l3_w, self.l3_b)
        # torch Softplus(beta=2): log(1 + exp(2x)) / 2
        return jax.nn.softplus(2.0 * x) / 2.0
