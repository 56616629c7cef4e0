"""Convolution modules with torch-compatible weight-norm parameterization.

The reference weight-norms nearly every conv (modules.py:128-146,
models.py:125, :177-183, :212-219) via ``torch.nn.utils.weight_norm``:
``w = g * v / ||v||`` with the norm taken over all dims except dim 0. To make
reference checkpoints load directly and to keep training dynamics faithful,
parameters here are stored in the *torch layout*:

  Conv1d          weight (out, in/groups, k)        norm over (in/groups, k)
  ConvTranspose1d weight (in, out/groups, k)        norm over (out/groups, k)
  Conv2d          weight (out, in, kh, kw)          norm over (in, kh, kw)

and transposed to XLA's HIO/HWIO layout at apply time (a few-KB transpose XLA
folds into the weight-prep epilogue). ``fold_weight_norm`` bakes ``g, v`` into
a plain ``weight`` for inference -- the TPU equivalent of the reference's
``remove_weight_norm`` (models.py:162-167, modules.py:178-184).

Initialization matches torch Conv defaults (kaiming-uniform bound
``1/sqrt(fan_in)`` for weight and bias); with weight norm, ``g`` starts at
``||v||`` exactly like torch's wrapper. Note the reference's 0.01-normal
``init_weights`` (commons.py:8-11) is a no-op on weight-normed convs -- the
pre-forward hook recomputes ``weight`` from ``v, g`` -- so it is intentionally
not reproduced.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1  # reference: modules.py:17


def _torch_conv_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _norm_except_dim0(v: jnp.ndarray) -> jnp.ndarray:
    """L2 norm over all dims except 0, keepdims (torch norm_except_dim)."""
    axes = tuple(range(1, v.ndim))
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))


class _WeightNormMixin:
    """Shared weight creation for the conv modules below."""

    def _weight(self, shape: Sequence[int], fan_in: int, zero_init: bool) -> jnp.ndarray:
        if zero_init:
            w_init = nn.initializers.zeros
        else:
            w_init = _torch_conv_init(fan_in)
        if getattr(self, "spectral_norm", False):
            return self._spectral_weight(shape, w_init)
        if not self.weight_norm:
            return self.param("weight", w_init, tuple(shape))
        v = self.param("weight_v", w_init, tuple(shape))
        g_shape = (shape[0],) + (1,) * (len(shape) - 1)
        # torch weight_norm initializes g = ||v|| so the initial effective
        # weight equals v; the lambda closes over the freshly created v.
        g = self.param("weight_g", lambda rng, s: _norm_except_dim0(v).reshape(s), g_shape)
        return v * (g / _norm_except_dim0(v))

    def _spectral_weight(self, shape: Sequence[int], w_init) -> jnp.ndarray:
        """Spectral normalization w / sigma_max(w) via one power-iteration step
        per call (the torch.nn.utils.spectral_norm semantics used by the
        discriminators when use_spectral_norm=true, models.py:175).

        The left singular vector estimate lives in the mutable ``spectral``
        collection ('weight_u', matching the torch buffer name); callers that
        apply with ``mutable=['spectral']`` persist the iteration, others use
        the stored estimate read-only (torch eval mode).
        """
        eps = 1e-12
        w = self.param("weight_orig", w_init, tuple(shape))
        mat = w.reshape(shape[0], -1)
        u_var = self.variable(
            "spectral", "weight_u",
            lambda: jax.random.normal(self.make_rng("params"), (shape[0],), jnp.float32),
        )
        u = jax.lax.stop_gradient(u_var.value)
        v = mat.T.astype(jnp.float32) @ u
        v = v / (jnp.linalg.norm(v) + eps)
        u_new = mat.astype(jnp.float32) @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + eps)
        if not self.is_initializing() and self.is_mutable_collection("spectral"):
            # persists only when 'spectral' is listed in apply(mutable=...)
            u_var.value = jax.lax.stop_gradient(u_new)
        sigma = jnp.dot(u_new, mat.astype(jnp.float32) @ v)
        return w / sigma.astype(w.dtype)

    def _bias(self, out_channels: int, fan_in: int) -> jnp.ndarray | None:
        if not self.use_bias:
            return None
        return self.param("bias", _torch_conv_init(fan_in), (out_channels,))


def pack_conv_weight(w_hio: jnp.ndarray, dilation: int, p: int):
    """Repack a same-padded dilated conv kernel for space-to-depth evaluation.

    A stride-1, symmetric-pad conv ``y[t] = sum_tau x[t + d*tau - r] @ w[tau]``
    (r = d*(k-1)/2) is exactly equivalent, after the free row-major reshape
    ``(T, C) -> (T/p, p*C)``, to a packed conv with block-Toeplitz weights:

        wp[delta - dmin, ph*Cin + ci, j*Cout + co] = w[tau, ci, co]
        where p*delta + ph = j + d*tau - r.

    Returns ``(wp (kp, p*Cin, p*Cout), pad_lo, pad_hi)`` with
    ``pad_lo = -dmin``, ``pad_hi = dmax`` so output length is preserved.

    Why: the decoder's late stages have 32/64 channels -- 1/16th MXU lane
    occupancy under the direct lowering. Packing by p = 128/C trades a sparse
    (block-Toeplitz) but *dense-computed* kernel for full lane occupancy; net
    ~3-6x fewer MXU passes for the HiFi-GAN kernel/dilation mix.
    """
    import numpy as np

    k, cin, cout = w_hio.shape
    r = dilation * (k - 1) // 2
    d_min = -((r + p - 1) // p)  # floor(-r/p)
    d_max = (p - 1 + dilation * (k - 1) - r) // p
    kp = d_max - d_min + 1

    # One einsum against a constant 0/1 placement tensor (constant-folded by
    # XLA) instead of kp*p dynamic-update-slices per call.
    place = np.zeros((k, kp, p, p), w_hio.dtype)  # [tau, delta, phase, j]
    for j in range(p):
        for tau in range(k):
            u = j + dilation * tau - r
            place[tau, u // p - d_min, u % p, j] = 1
    wp = jnp.einsum("tio,tdpj->dpijo", w_hio, jnp.asarray(place))
    wp = wp.reshape(kp, p * cin, p * cout)
    return wp, -d_min, d_max


def pack_conv_weight_pertap(w_hio: jnp.ndarray, dilation: int, p: int):
    """Per-tap packed weights for a dilated conv at pack p=2.

    The block-Toeplitz form (:func:`pack_conv_weight`) computes every packed
    row-shift densely: a (k, d) conv costs ``kp = d_max-d_min+1 ~ (k-1)d/p+2``
    full (p*C, p*C) MXU passes of which only ~k*p/p^2 blocks are nonzero --
    2.7-4.7x MAC inflation for the HiFi-GAN d in (3, 5) convs. This variant
    spends exactly ONE full-lane pass per original tap instead:

    For output phase j at packed row q, tap tau reads input time
    ``u = j + d*tau - r`` i.e. packed (row q + delta_j, phase u%2). With p=2
    and d odd the two output phases read OPPOSITE input phases, so one
    (L, 2C) operand assembled as ``lanes[mC:(m+1)C] = xpad[sigma_m + q]``
    (a plain row-shifted read per lane half -- no lane movement) against a
    block-diagonal/anti-diagonal weight computes both phases' tap-tau
    contribution in a single (L,2C)@(2C,2C) dot. k dots total: 2x MAC
    inflation uniformly, vs kp >= k dense row-shifts (strictly fewer passes
    whenever d > 1; for d=1 the Toeplitz form is denser -- keep it there).

    Generalizes to any p with gcd(d, p) = 1 (each input phase read by
    exactly one output phase per tap): the p phase offsets ``u = j + d*tau
    - r`` are consecutive integers, so their packed rows take at most TWO
    values splitting at the u = 0 (mod p) wrap -- the operand is always at
    most one lane-prefix select of two row-shifted reads.

    Returns ``(wt (k, p*Cin, p*Cout), shifts, lo, hi)`` where ``shifts[tau]
    = (sigma_0, .., sigma_{p-1})`` are the non-negative row shifts into the
    ``(lo, hi)``-padded input per input-phase lane block (a prefix of equal
    larger shifts, then equal smaller; all equal when no select is needed),
    and (lo, hi) match pack_conv_weight's padding exactly.
    """
    import math

    import numpy as np

    assert math.gcd(dilation, p) == 1, (dilation, p)
    k, cin, cout = w_hio.shape
    r = dilation * (k - 1) // 2
    d_min = -((r + p - 1) // p)
    d_max = (p - 1 + dilation * (k - 1) - r) // p

    place = np.zeros((k, k, p, p), w_hio.dtype)  # [tau, tap-slot, in-phase, j]
    shifts = []
    for tau in range(k):
        sigma = [0] * p
        for j in range(p):
            u = j + dilation * tau - r
            place[tau, tau, u % p, j] = 1
            sigma[u % p] = u // p - d_min
        # prefix structure: phases [0, ph0) hold shift f+1, [ph0, p) hold f
        n0 = sum(1 for s in sigma if s == sigma[0])
        assert all(s == sigma[0] for s in sigma[:n0]), sigma
        assert all(s == sigma[-1] for s in sigma[n0:]), sigma
        shifts.append(tuple(sigma))
    wt = jnp.einsum("tio,tdpj->dpijo", w_hio, jnp.asarray(place))
    return wt.reshape(k, p * cin, p * cout), tuple(shifts), -d_min, d_max


def pack_convtranspose_weight(w_iok: jnp.ndarray, stride: int, padding: int, p: int):
    """Repack ``ConvTranspose1d(k, s, p_t)`` for packed-domain evaluation.

    With the input viewed packed by ``p/s`` (``u_packed (Tu*s/p, (p/s)*Cin)``,
    a free reshape; requires s | p) and the output packed by ``p``, the
    transposed conv is exactly a stride-1 conv:

        x_packed[q] = sum_i u_packed[q - pad_lo + i] @ wp[i]

    Derivation: x[s*q' + r] = sum_d u[q' - d] @ Wt[:, :, s*d + r + p_t]
    (see NormConvTranspose1d._polyphase); substituting p*q + j = s*q' + r and
    folding the u phase e into packed channels gives

        wp[delta - dmin, e*Cin + ci, j*Cout + co] = Wt[ci, co, tau]
        where m = (tau - j - p_t)/s (when integral), and
        (p/s)*(-delta) + e = -m  i.e.  delta = -ceil-div, e = (-m) mod (p/s).

    Returns (wp (kp, (p/s)*Cin, p*Cout), pad_lo, pad_hi). Output row count
    equals input row count (Tu/(p/s) == (Tu*s)/p), so a fused kernel can share
    tile/halo geometry between this and ordinary packed convs.
    """
    import numpy as np

    cin, cout, k = w_iok.shape
    s = stride
    assert p % s == 0, (p, s)
    ps = p // s

    entries = []  # (delta, e, j, tau)
    for j in range(p):
        for tau in range(k):
            num = tau - j - padding
            if num % s != 0:
                continue
            m = num // s
            delta = (-m) // ps  # floor division = floor((-m)/ps)
            e = (-m) % ps
            entries.append((delta, e, j, tau))
    d_min = min(d for d, *_ in entries)
    d_max = max(d for d, *_ in entries)
    kp = d_max - d_min + 1

    place = np.zeros((k, kp, ps, p), w_iok.dtype)  # [tau, delta, e, j]
    for delta, e, j, tau in entries:
        place[tau, delta - d_min, e, j] = 1
    # wp[d, e*Cin+ci, j*Cout+co] = sum_tau Wt[ci, co, tau] * place[tau, d, e, j]
    wp = jnp.einsum("iot,tdej->deijo", w_iok, jnp.asarray(place))
    wp = wp.reshape(kp, ps * cin, p * cout)
    return wp, -d_min, d_max


def _grouped_pack_select(k: int, stride: int, padding: int, p: int,
                         lo: int, n_rows: int):
    """Tap-selection tensor for the packed-grouped-conv weight (NormConv1d).

    ``S[tau, q, j] = 1`` iff output ``j`` (of the ``m = p // stride`` produced
    per packed input row) reads window position ``q`` at kernel tap ``tau``,
    where the operand window spans packed rows ``[lo, lo + n_rows)`` relative
    to the current row: ``q = stride*j - padding + tau - lo*p``. The packed
    weight is then ``einsum('gtco,tqj->gqcjo', Wg, S)`` -- a contraction whose
    VJP is another tiny einsum (a gather-based build would backprop through a
    scatter-add, measured 2.6 ms/step on the S-discriminator geometries).
    """
    import numpy as np

    m = p // stride
    sel = np.zeros((k, n_rows * p, m), np.float32)
    for j in range(m):
        for tau in range(k):
            q = stride * j - padding + tau - lo * p
            assert 0 <= q < n_rows * p, (q, n_rows, p)
            sel[tau, q, j] = 1.0
    return sel


class NormConv1d(nn.Module, _WeightNormMixin):
    """1-D conv over ``(B, T, C)`` with optional torch-style weight norm.

    ``padding`` is the explicit symmetric padding integer the reference passes
    (commons.py:14-15 ``get_padding``). ``pack`` > 1 evaluates the conv in
    space-to-depth form (see :func:`pack_conv_weight`) -- bit-exact semantics,
    full MXU lanes for small channel counts; requires stride 1, groups 1,
    same-length padding, and pack | T.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    spectral_norm: bool = False
    zero_init: bool = False
    pack: int = 1
    # Lane-starved grouped convs (channels-per-group <= 32) auto-route to the
    # space-to-depth batched-GEMM form; False forces lax's grouped conv.
    pack_grouped: bool = True
    # Opt-in per-tap evaluation of strongly dilated packed convs (measured
    # slower than block-Toeplitz under XLA; see _packed).
    pertap_xla: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        assert in_ch % self.groups == 0, (in_ch, self.groups)
        shape = (self.features, in_ch // self.groups, self.kernel_size)
        fan_in = shape[1] * self.kernel_size
        w = self._weight(shape, fan_in, self.zero_init)
        b = self._bias(self.features, fan_in)

        w = jnp.transpose(w, (2, 1, 0)).astype(self.dtype)  # -> (k, in/g, out) HIO

        if (
            self.pack > 1
            and self.stride == 1
            and self.groups == 1
            and self.padding == (self.kernel_size * self.dilation - self.dilation) // 2
            and x.shape[1] % self.pack == 0
        ):
            y = self._packed(x.astype(self.dtype), w)
        elif self._grouped_pack(x.shape[1], in_ch) is not None:
            y = self._packed_grouped(x.astype(self.dtype), w)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                w,
                window_strides=(self.stride,),
                padding=[(self.padding, self.padding)],
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=self.groups,
            )
        if b is not None:
            y = y + b.astype(self.dtype)
        return y

    def _packed(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        bsz, t, cin = x.shape
        p, d, k = self.pack, self.dilation, self.kernel_size
        r = d * (k - 1) // 2
        kp = (p - 1 + d * (k - 1) - r) // p + (r + p - 1) // p + 1
        if self.pertap_xla and k < kp:
            # Per-tap form: k shifted full-lane dots instead of the kp-tap
            # block-Toeplitz conv (kp ~ d*(k-1)/p >> k for strongly dilated
            # taps) -- the MAC argument behind the Pallas per-tap kernels
            # (pack_conv_weight_pertap), restated as plain differentiable
            # XLA. MEASURED AND REJECTED as a default (hence the opt-in
            # flag): on the v5e train step the k per-tap slice-repacks
            # materialize in HBM and the k separate dots lose XLA's conv
            # fusion -- dec fwd 5.5 -> 11.6 ms, bwd 10.1 -> 16.7 ms despite
            # 2.2-2.5x fewer MACs. In Pallas the shifted reads are free
            # in-register, which is why the same trick wins 15 ms there.
            xpad = jnp.pad(x, ((0, 0), (r, r), (0, 0)))
            eye = jnp.eye(p, dtype=self.dtype)
            wt = jnp.einsum("pq,tio->tpiqo", eye, w).reshape(
                k, p * cin, p * self.features)
            y = None
            for tau in range(k):
                xs = jax.lax.slice_in_dim(xpad, d * tau, d * tau + t, axis=1)
                c = xs.reshape(bsz, t // p, p * cin) @ wt[tau]
                y = c if y is None else y + c
            return y.reshape(bsz, t, self.features)
        wp, pad_lo, pad_hi = pack_conv_weight(w, self.dilation, p)
        xp = x.reshape(bsz, t // p, p * cin)  # free: row-major bitcast
        y = jax.lax.conv_general_dilated(
            xp, wp.astype(self.dtype), (1,), [(pad_lo, pad_hi)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return y.reshape(bsz, t, self.features)

    def _grouped_pack(self, t: int, in_ch: int):
        """Packed-grouped-conv geometry, or None when the direct grouped conv
        should run. Applies when channels-per-group is MXU-lane-starved
        (DiscriminatorS's groups=4..256 convs run 4 in-channels per group =
        4/128 lanes, measured 1.8% MXU utilization = 14.7 of the 71.7 ms
        train step; ref models.py:207-232). Returns (p, lo, n_rows, m)."""
        g, s, k, pad = self.groups, self.stride, self.kernel_size, self.padding
        if not self.pack_grouped or g <= 1 or self.dilation != 1:
            return None
        if self.features % g:
            return None  # ragged output groups: leave to the direct lowering
        cg = in_ch // g
        if cg > 32:
            return None  # >= 1/4 lane occupancy already; direct conv is fine
        p = (max(1, 128 // cg) // s) * s
        if p < s or p % s or t % p or t < 2 * p:
            return None
        m = p // s
        if (t + 2 * pad - k) // s + 1 != t // s:
            return None  # packed form assumes exact T/s output length
        lo = -((pad + p - 1) // p)                  # floor(-pad / p)
        hi = (s * (m - 1) + k - 1 - pad) // p
        return p, lo, hi - lo + 1, m

    def _packed_grouped(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        """Grouped conv as full-lane batched GEMM via space-to-depth packing.

        Per group, ``p = 128 // cg`` time steps fold into the lane dimension
        (``p*cg = 128``); the strided conv becomes one
        ``(G, B*T/p, n_rows*p*cg) @ (G, n_rows*p*cg, m*og)`` batched matmul
        against a block-Toeplitz weight assembled by a constant tap-selection
        einsum (see _grouped_pack_select: fully differentiable, and its VJP
        is another einsum rather than the 2.6 ms/step scatter-add a gather
        build costs). MAC inflation is ``n_rows*p / k`` (~2.3x at the
        S-discriminator geometry) on FLOPs small enough that full lanes
        dominate. Exact semantics -- same contraction, reordered.
        """
        bsz, t, cin = x.shape
        g, s, k, pad = self.groups, self.stride, self.kernel_size, self.padding
        cg, og = cin // g, self.features // g
        p, lo, n_rows, m = self._grouped_pack(t, cin)
        rows = t // p

        # Block-Toeplitz packed weight via a constant tap-selection einsum
        wg = w.reshape(k, cg, g, og).transpose(2, 0, 1, 3)   # (G, k, cg, og)
        sel = jnp.asarray(_grouped_pack_select(k, s, pad, p, lo, n_rows),
                          self.dtype)
        wp = jnp.einsum("gtco,tqj->gqcjo", wg, sel)
        wp = wp.reshape(g, n_rows * p * cg, m * og)

        xg = (x.reshape(bsz, rows, p, g, cg)
              .transpose(3, 0, 1, 2, 4).reshape(g, bsz, rows, p * cg))
        xg = jnp.pad(xg, ((0, 0), (0, 0), (-lo, lo + n_rows - 1), (0, 0)))
        win = jnp.concatenate(
            [xg[:, :, r : r + rows] for r in range(n_rows)], axis=-1)
        y = jnp.einsum("gbrd,gde->gbre", win, wp)      # (G, B, rows, m*og)
        y = (y.reshape(g, bsz, rows, m, og)
             .transpose(1, 2, 3, 0, 4).reshape(bsz, rows * m, g * og))
        return y


class NormConvTranspose1d(nn.Module, _WeightNormMixin):
    """Transposed 1-D conv matching ``torch.nn.ConvTranspose1d(k, s, padding=p)``.

    Two exact implementations:

    - ``polyphase=True`` (default, requires ``k - 2p == s`` as in the
      generator's ``p=(k-u)//2`` choice, models.py:124-127): decompose the
      transposed conv into its polyphase filters -- one ordinary stride-1 conv
      at *input* resolution producing ``s * features`` channels, then a
      depth-to-space reshape. This keeps the MXU contraction fat
      (``in -> s*out`` instead of ``in -> out``) and multiplies no inserted
      zeros; an ``lhs_dilation`` lowering wastes ``(s-1)/s`` of its MACs on
      zeros unless the backend rediscovers the decomposition.
    - ``polyphase=False``: the classic input-dilated conv with flipped kernel
      and padding ``k - 1 - p``.

    Output length is ``(T-1)*s + k - 2p`` (= ``T*s`` in the polyphase case).
    Parameters are identical either way (torch layout ``(in, out, k)``), so
    checkpoints are interchangeable between the two paths.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = True
    polyphase: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k, s, p = self.kernel_size, self.stride, self.padding
        shape = (in_ch, self.features, k)  # torch (in, out, k)
        fan_in = shape[1] * k  # torch fan-in convention for transposed convs
        w = self._weight(shape, fan_in, zero_init=False)
        b = self._bias(self.features, fan_in)

        if self.polyphase and k - 2 * p == s:
            y = self._polyphase(x, w)
        else:
            # Input-dilated equivalent conv: flip taps, (k, in, out) HIO.
            wf = jnp.transpose(jnp.flip(w, axis=2), (2, 0, 1)).astype(self.dtype)
            pad = k - 1 - p
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), wf, (1,), [(pad, pad)],
                lhs_dilation=(s,), dimension_numbers=("NHC", "HIO", "NHC"),
            )
        if b is not None:
            y = y + b.astype(self.dtype)
        return y

    def _polyphase(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        """y[s*q + r, co] = sum_d x[q - d, ci] * w[ci, co, s*d + r + p]."""
        import numpy as np

        in_ch = x.shape[-1]
        k, s, p = self.kernel_size, self.stride, self.padding
        d_min = -((s - 1 + p) // s)
        d_max = (k - 1 - p) // s
        kp = d_max - d_min + 1

        # Tap table: t[i, r] = s*(d_min + i) + r + p, masked to [0, k).
        t_idx = s * (d_min + np.arange(kp))[:, None] + np.arange(s)[None, :] + p
        valid = (t_idx >= 0) & (t_idx < k)
        gathered = w[:, :, np.clip(t_idx, 0, k - 1)]          # (in, out, kp, s)
        gathered = jnp.where(jnp.asarray(valid), gathered, 0.0)

        # XLA correlation index runs opposite to d: flip taps.
        # W_conv[i, ci, r*out + co] = gathered[ci, co, kp-1-i, r]
        wc = jnp.transpose(gathered, (2, 0, 3, 1))[::-1]       # (kp, in, s, out)
        wc = wc.reshape(kp, in_ch, s * self.features).astype(self.dtype)

        pad_lo = kp - 1 + d_min
        pad_hi = -d_min
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), wc, (1,), [(pad_lo, pad_hi)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        bsz, t, _ = y.shape
        return y.reshape(bsz, t * s, self.features)


class NormConv2d(nn.Module, _WeightNormMixin):
    """2-D conv over ``(B, H, W, C)`` for the period discriminators
    (models.py:176-183).

    Alternatively accepts a 3-D ``(B', H, C)`` input when ``kernel_size[1] ==
    1`` and runs the identical contraction as a 1-D conv along H (parameters
    and math unchanged). The period discriminators use this to fold their
    width-``p`` period axis into the batch: a ``(k, 1)`` kernel never mixes
    the W axis, and W = 2..11 as the second-minor (sublane) dim of an NHWC
    conv wastes most of each 8-sublane tile, while H is large."""

    features: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    use_bias: bool = True
    weight_norm: bool = True
    spectral_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        shape = (self.features, in_ch, kh, kw)  # torch (out, in, kh, kw)
        fan_in = in_ch * kh * kw
        w = self._weight(shape, fan_in, zero_init=False)
        b = self._bias(self.features, fan_in)

        if x.ndim == 3:
            assert kw == 1 and self.stride[1] == 1 and self.padding[1] == 0, (
                "3-D input requires a width-degenerate (k, 1) kernel")
            w1 = jnp.transpose(w[..., 0], (2, 1, 0)).astype(self.dtype)  # HIO
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w1, (self.stride[0],),
                [(self.padding[0], self.padding[0])],
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
        else:
            wt = jnp.transpose(w, (2, 3, 1, 0)).astype(self.dtype)  # -> HWIO
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                wt,
                window_strides=self.stride,
                padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if b is not None:
            y = y + b.astype(self.dtype)
        return y


def fold_weight_norm(params):
    """Bake ``weight_v``/``weight_g`` pairs into plain ``weight`` leaves.

    The inference-time analogue of the reference's ``remove_weight_norm``:
    after folding, each conv computes one weight transpose instead of a
    normalize-rescale chain. Modules accept either parameterization because
    the fold preserves the pytree structure consumed by `_WeightNormMixin`
    only if the module is rebuilt with ``weight_norm=False``; use together
    with a model constructed via ``build_model(..., folded=True)``.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    done = set()
    for path, leaf in flat.items():
        if path in done:
            continue
        if path[-1] == "weight_v":
            g_path = path[:-1] + ("weight_g",)
            v = leaf
            g = flat[g_path]
            out[path[:-1] + ("weight",)] = v * (g / _norm_except_dim0(v))
            done.add(g_path)
        elif path[-1] == "weight_g":
            v_path = path[:-1] + ("weight_v",)
            if v_path in flat:
                continue  # handled with its v
            out[path] = leaf
        else:
            out[path] = leaf
    return flax.traverse_util.unflatten_dict(out)
