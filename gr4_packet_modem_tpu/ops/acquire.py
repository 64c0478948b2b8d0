"""Syncword acquisition: batched correlation + CFAR detection.

TPU re-design of the reference SyncwordDetection block
(syncword_detection.hpp): the reference runs an overlap-save FFT correlation
(fft 2048) against ``2*freq_bins+1`` frequency-shifted RRC-modulated syncword
replicas and a sequential best-in-window + history-median detector over every
sample. Here the same math is evaluated block-parallel:

- **Correlation**: two interchangeable backends.
  ``fft``: frames ``[F, N]`` -> one forward FFT per frame, one inverse FFT per
  (frame, bin) — the reference's overlap-save scheme, batched.
  ``conv``: the correlation is expressed directly as a real 2x2 convolution
  with the replica bank so XLA lowers it onto the MXU (297-tap kernels, 2 in
  / 2*(2*bins+1) out features). Numerically equivalent (f32).
- **Detection**: the reference's running-best state machine is equivalent (at
  event level) to: ``t`` is detected iff its best-bin power is the maximum of
  the centered window ``[t-W, t+W]`` (first index wins ties) and at least half
  of that window is below ``power/threshold`` (the history-median CFAR proxy,
  syncword_detection.hpp:267-298). The first condition is a sliding-window
  max; the second is evaluated only at the sparse candidates (<= T/W).
- **Estimation**: quadratic interpolation of power in frequency and time,
  phase correction for the frequency delta, amplitude and Es/N0 estimates —
  the closed-form math of syncword_detection.hpp:56-115, vectorized over
  candidates.

Block edges are handled with an overlap carry: the caller feeds overlapping
blocks and detections are indexed in absolute sample coordinates.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import constants as C
from ..utils.firdes import rx_rrc_taps

__all__ = ["AcquisitionConfig", "Detections", "SyncwordAcquirer", "modulated_syncword"]


def modulated_syncword(sps: int = 4) -> tuple[np.ndarray, float]:
    """RRC-modulated BPSK syncword replica and its self-correlation
    (syncword_detection.hpp:154-164)."""
    taps, _ = rx_rrc_taps(sps)
    sync = np.asarray(C.SYNCWORD)
    const = np.asarray(C.BPSK_CONSTELLATION)
    n = (sync.size - 1) * sps + taps.size
    out = np.zeros(n, dtype=np.complex64)
    for j, b in enumerate(sync):
        out[j * sps : j * sps + taps.size] += const[b] * taps
    self_corr = float(np.sum(np.abs(out) ** 2))
    return out, self_corr


@dataclass(frozen=True)
class AcquisitionConfig:
    samples_per_symbol: int = 4
    fft_size: int = C.SYNC_FFT_SIZE
    freq_bins: int = 4  # search bins [-freq_bins, +freq_bins]
    time_threshold: int = C.SYNC_TIME_THRESHOLD
    power_threshold: float = C.SYNC_POWER_THRESHOLD
    max_detections: int = 64  # static bound per processed block
    # correlation backend:
    #   "auto"      fused on TPU, fft elsewhere (default)
    #   "fused"     Pallas kernel: per-bin product+iFFT+power reduced in
    #               VMEM (ops/acquire_pallas.py) — detection-identical to
    #               fft, ~1.8x faster on TPU
    #   "fused_bf16" same kernel with bf16 matmul inputs / f32 accumulation
    #               (4x MXU rate on the bulk contraction; candidate phase /
    #               adjacent powers still recomputed exactly at f32)
    #   "fft"       overlap-save FFT, as the reference
    #   "conv"      the correlation as a real 2-plane MXU convolution (f32)
    #   "conv_bf16" same with bf16 inputs / f32 accumulation
    backend: str = "auto"

    def resolved_backend(self) -> str:
        if self.backend == "auto":
            import jax

            # the fused kernel needs N = 16 * N2 with N2 a multiple of 128
            # lanes; odd fft sizes resolve to the fft backend instead. Auto
            # additionally requires the production-shape probe to pass
            # (compile + output validation, ops/pallas_probe.py) — an
            # explicit backend="fused" bypasses the probe.
            if jax.default_backend() == "tpu" and self.fft_size % 2048 == 0:
                from .acquire_pallas import fused_enabled

                sync_len = modulated_syncword(self.samples_per_symbol)[0].size
                if fused_enabled(
                    self.fft_size, sync_len, 2 * self.freq_bins + 1
                ):
                    return "fused"
            return "fft"
        return self.backend


@jax.tree_util.register_pytree_node_class
@dataclass
class Detections:
    """Sparse detection set (sorted by sample index; invalid entries last)."""

    index: jax.Array      # int32 [D] absolute sample index of syncword start
    valid: jax.Array      # bool [D]
    amplitude: jax.Array  # float32 [D]
    phase: jax.Array      # float32 [D]
    freq: jax.Array       # float32 [D] rad/sample
    freq_bin: jax.Array   # int32 [D]
    time_est: jax.Array   # float32 [D] in [-0.5, 0.5]
    noise_power: jax.Array  # float32 [D]
    esn0_db: jax.Array    # float32 [D]
    overflow: jax.Array   # bool [] more peaks than max_detections slots

    def tree_flatten(self):
        return (
            self.index, self.valid, self.amplitude, self.phase, self.freq,
            self.freq_bin, self.time_est, self.noise_power, self.esn0_db,
            self.overflow,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class SyncwordAcquirer:
    def __init__(self, config: AcquisitionConfig = AcquisitionConfig()):
        self.config = config
        sps = config.samples_per_symbol
        replica, self_corr = modulated_syncword(sps)
        self.sync_len = replica.size
        self.self_corr = self_corr
        nbins = 2 * config.freq_bins + 1
        self.num_bins = nbins
        # frequency-shifted replicas: bin spacing pi / sync_len rad/sample
        # (syncword_detection.hpp:166-182)
        bins = np.arange(-config.freq_bins, config.freq_bins + 1)
        k = np.arange(self.sync_len)
        shift = np.exp(
            1j * (bins[:, None] * np.pi / self.sync_len) * k[None, :]
        )
        self.replicas = (replica[None, :] * shift).astype(np.complex64)  # [nb, L]
        n = config.fft_size
        # the gather-free overlap-save framing needs the (sync_len-1)-sample
        # frame lookahead to fit inside one stride: n - s <= s
        if n < 2 * (self.sync_len - 1):
            raise ValueError(
                f"fft_size must be >= {2 * (self.sync_len - 1)} "
                f"(2*(sync_len-1)) for the overlap-save framing"
            )
        if config.backend in ("fused", "fused_bf16") and n % 2048 != 0:
            raise ValueError(
                "the fused backend needs fft_size to be a multiple of 2048 "
                "(N = 16 x N2 factorization with 128-lane-aligned N2); use "
                'backend="auto" to fall back to fft for other sizes'
            )
        self.stride = n - self.sync_len + 1
        # the replica FFTs are computed on-device inside the jit (from the
        # small [nb, sync_len] replica literal) — embedding the [nb, N]
        # complex FFT table as a literal bloats the HLO and the remote TPU
        # compiler is pathologically slow on megabyte literals
        # conv backend kernel: real/imag planes.
        # corr_b[t] = sum_k conj(rep_b[k]) x[t+k]
        #  re = xr*rr + xi*ri ; im = xi*rr - xr*ri
        rr, ri = self.replicas.real, self.replicas.imag  # [nb, L]
        kernel = np.zeros((self.sync_len, 2, 2 * nbins), np.float32)
        kernel[:, 0, :nbins] = rr.T
        kernel[:, 1, :nbins] = ri.T
        kernel[:, 0, nbins:] = -ri.T
        kernel[:, 1, nbins:] = rr.T
        self._conv_kernel = kernel  # numpy: embedded at trace time
        # out-of-band noise estimation filter: the reference measures noise
        # power in the central (out-of-band) half of the FFT spectrum
        # (syncword_detection.hpp:254-265, which for flat noise equals the
        # full-band complex noise power). Equivalent measure here: a 33-tap
        # high-pass selecting |f| in [0.3, 0.5] where the RRC signal (cutoff
        # ~0.17) has no energy; for white noise E|y|^2 = P * sum(h^2).
        from scipy import signal as _sig

        hp = _sig.remez(
            33, [0.0, 0.22, 0.3, 0.5], [0.0, 1.0], fs=1.0
        ).astype(np.float32)
        self._noise_filter = hp  # numpy: embedded at trace time
        self._noise_gain = float(np.sum(hp**2))
        # resolve the backend EAGERLY: "auto" consults the fused kernel's
        # capability probe, which must run outside any jit trace (a cold
        # probe at trace time cannot execute — ops/pallas_probe.py).
        # _corr_points consults the fetch probe the same way, so warm it
        # here too (a standalone acquirer never passes through Receiver's
        # pre-warm).
        config.resolved_backend()
        if jax.default_backend() == "tpu":
            from .fetch_pallas import fetch_enabled

            fetch_enabled()

    # ------------------------------------------------------------ correlation

    def _frames(self, x: jax.Array) -> jax.Array:
        """Overlap-save frames [F, N] without a gather: frame f =
        x[f*s : f*s+n] splits into a body [nf, s] reshape and the
        (n-s)-sample lookahead tail taken from a shifted reshape
        (n-s = sync_len-1 <= s enforced by the constructor)."""
        n, s = self.config.fft_size, self.stride
        t = x.shape[0]
        nf = (t - n) // s + 1
        body = x[: nf * s].reshape(nf, s)
        pad = max(0, s + nf * s - t)
        shifted = x[s:]
        if pad:
            shifted = jnp.concatenate([shifted, jnp.zeros(pad, x.dtype)])
        tail = shifted[: nf * s].reshape(nf, s)[:, : n - s]
        return jnp.concatenate([body, tail], axis=1)  # [F, N]

    def _frames_planes(
        self, x: jax.Array, fpad: int
    ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Overlap-save frames as TWO contiguous stride views per I/Q plane
        (``(ar, ai, br, bi)``, each ``[FPAD, stride]``): the frame bodies
        and the one-stride-shifted lookahead. Both are free reshapes of the
        (zero-extended) flat plane — the fused kernel assembles the actual
        frames in VMEM, so no framing copies happen on the host at all.
        (Measured-worse alternatives, docs/PERF_R3.md round-3b: full host
        framing+transposes cost ~5 ms, host framing with in-kernel
        transposes ~2.7 ms, of the 16ch x 2^19 correlate.)"""
        n, s = self.config.fft_size, self.stride
        t = x.shape[0]
        need = (fpad + 1) * s + (n - s)  # B view reaches (fpad+1)*s
        xr, xi = x.real, x.imag
        if need > t:
            z = jnp.zeros(need - t, xr.dtype)
            xr = jnp.concatenate([xr, z])
            xi = jnp.concatenate([xi, z])

        def views(xf):
            return (
                xf[: fpad * s].reshape(fpad, s),
                xf[s : (fpad + 1) * s].reshape(fpad, s),
            )

        ar, br = views(xr)
        ai, bi = views(xi)
        return ar, ai, br, bi

    def _replica_fft_conj(self) -> tuple[jax.Array, jax.Array]:
        """conj(FFT(zero-padded replicas)) as I/Q planes [nb, N], computed
        on-device from the small replica literal (embedding the full table
        bloats the HLO; complex constants cannot be device-transferred)."""
        n = self.config.fft_size
        rep = jax.lax.complex(
            jnp.zeros((self.num_bins, n), jnp.float32)
            .at[:, : self.sync_len].set(self.replicas.real),
            jnp.zeros((self.num_bins, n), jnp.float32)
            .at[:, : self.sync_len].set(self.replicas.imag),
        )
        rf = jnp.conj(jnp.fft.fft(rep, axis=-1))
        return rf.real, rf.imag

    def _correlate_fft(self, x: jax.Array) -> jax.Array:
        """Correlation powers via overlap-save FFT. x: [T] complex with
        T >= fft_size; returns complex correlations [nbins, T'] where
        T' = num_frames * stride."""
        n, s = self.config.fft_size, self.stride
        frames = self._frames(x)
        nf = frames.shape[0]
        f = jnp.fft.fft(frames, axis=-1)  # [F, N]
        rfr, rfi = self._replica_fft_conj()
        replica_fft_conj = jax.lax.complex(rfr, rfi)
        prod = f[:, None, :] * replica_fft_conj[None]  # [F, nb, N]
        corr = jnp.fft.ifft(prod, axis=-1)[..., :s]  # [F, nb, S] linear part
        return jnp.moveaxis(corr, 1, 0).reshape(self.num_bins, nf * s)

    def _fused_wide(self) -> bool:
        """Wide-layout kernel selection (acquire_pallas module docstring).
        Off by default: the round-5 A/B on v5e measured the wide layout
        SLOWER (14.2 vs 10.5 ms per 16ch x 2^19 step) — the MXU streams
        only M rows through a [M,16]@[16,N] dot, so the narrow radix-16
        dots carry no 128-row padding to recover, while the block-diagonal
        K=128 dots stream 8x the MACs. Kept as a documented negative
        result; ``PM_ACQ_WIDE=1`` re-enables for measurement."""
        import os

        return os.environ.get("PM_ACQ_WIDE") == "1"

    def _best_power_fused(
        self, x: jax.Array, bf16: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        """best-bin power/bin per sample via the fused Pallas correlator
        (ops/acquire_pallas.py): per-bin product+iFFT+power never leave
        VMEM. Returns (best_pow [T'], best_bin [T'])."""
        from .acquire_pallas import fused_best_power

        n, s = self.config.fft_size, self.stride
        f = (x.shape[0] - n) // s + 1
        bf = 16
        fpad = -(-f // bf) * bf
        ar, ai, br, bi = self._frames_planes(x, fpad)
        rfr, rfi = self._replica_fft_conj()
        bp, bb = fused_best_power(
            ar, ai, br, bi, rfr, rfi, n,
            interpret=jax.default_backend() != "tpu",
            block_frames=bf,
            bf16=bf16,
            wide=self._fused_wide(),
        )
        return bp[:f, :s].reshape(-1), bb[:f, :s].reshape(-1)

    def _corr_points(
        self, x: jax.Array, bins: jax.Array, times: jax.Array,
        windows: tuple[jax.Array, jax.Array] | None = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Exact correlation values at candidate points by direct dots:
        corr[b, t] = sum_k conj(rep[b, k]) x[t+k], evaluated for bins
        {b-1, b, b+1} at each point. Returns (re [D], im [D] at the centre
        bin, powers [D, 3]). ``windows`` (optional): precomputed
        ``(wr, wi)`` ``[D, sync_len]`` sample windows starting at ``times``
        — acquire() derives them from the (larger) noise-estimation regions
        so only ONE batched fetch runs per acquire (each fetch_regions call
        measured ~1.7 ms per 16ch x 2^19 step, docs/PERF_R5.md)."""
        ll = self.sync_len
        nb = self.num_bins
        if windows is not None:
            wr, wi = windows
        else:
            tc = jnp.clip(times, 0, x.shape[0] - ll)
            from .fetch_pallas import fetch_enabled, fetch_regions

            if jax.default_backend() == "tpu" and fetch_enabled():
                wr, wi = fetch_regions(x.real, x.imag, tc, ll)  # [D, L]
            else:
                wr = jax.vmap(
                    lambda t: jax.lax.dynamic_slice(x.real, (t,), (ll,))
                )(tc)  # [D, L]
                wi = jax.vmap(
                    lambda t: jax.lax.dynamic_slice(x.imag, (t,), (ll,))
                )(tc)
        b3 = jnp.stack(
            [jnp.maximum(bins - 1, 0), bins, jnp.minimum(bins + 1, nb - 1)],
            axis=-1,
        )  # [D, 3]
        onehot = jax.nn.one_hot(b3, nb, dtype=jnp.float32)  # [D, 3, nb]
        rr = jnp.einsum(
            "dbn,nl->dbl", onehot, jnp.asarray(self.replicas.real),
            preferred_element_type=jnp.float32,
        )
        ri = jnp.einsum(
            "dbn,nl->dbl", onehot, jnp.asarray(self.replicas.imag),
            preferred_element_type=jnp.float32,
        )
        cr = jnp.sum(wr[:, None] * rr + wi[:, None] * ri, axis=-1)  # [D, 3]
        ci = jnp.sum(wi[:, None] * rr - wr[:, None] * ri, axis=-1)
        return cr[:, 1], ci[:, 1], cr * cr + ci * ci

    def _correlate_conv(self, x: jax.Array, dtype=jnp.float32) -> jax.Array:
        """Correlation via MXU convolution. Returns [nbins, T-L+1] complex."""
        xr = jnp.stack([x.real, x.imag], axis=-1)[None].astype(dtype)
        out = jax.lax.conv_general_dilated(
            xr,
            jnp.asarray(self._conv_kernel).astype(dtype),
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )[0]  # [T-L+1, 2*nb]
        nb = self.num_bins
        return (out[:, :nb] + 1j * out[:, nb:]).T

    def correlate(self, x: jax.Array) -> jax.Array:
        backend = self.config.resolved_backend()
        if backend == "fft":
            return self._correlate_fft(x)
        if backend == "conv_bf16":
            return self._correlate_conv(x, jnp.bfloat16)
        return self._correlate_conv(x)

    # -------------------------------------------------------------- detection

    @partial(jax.jit, static_argnums=0)
    def acquire(
        self,
        x: jax.Array,
        index0: jax.Array = 0,
        fresh_lo: jax.Array | None = None,
        fresh_hi: jax.Array | None = None,
    ) -> Detections:
        """Detect syncwords in a sample block.

        x: complex64 ``[T]``. Correlations are computed for syncword starts in
        ``[0, T - sync_len]`` (feed overlapping blocks to cover edges);
        detection needs ``time_threshold`` margin on both sides, so only
        starts in ``[W, T_corr - W)`` are eligible. ``index0`` is added to the
        reported indices (absolute stream coordinates).

        ``fresh_lo``/``fresh_hi`` (optional) restrict eligible syncword
        starts to ``[fresh_lo, fresh_hi)`` *before* candidate selection: a
        streaming driver whose buffer carries look-back/look-ahead overlap
        hands only the fresh region's peaks to the top-k, so stale and
        lookahead peaks neither consume ``max_detections`` slots nor trip
        the overflow flag (they are re-seen when their own block is fresh).
        """
        cfg = self.config
        backend = cfg.resolved_backend()
        w = cfg.time_threshold
        pa_sel = pc_sel = bi_sel = None
        if backend.startswith("fused"):
            best_pow, best_bin_flat = self._best_power_fused(
                x, bf16=backend == "fused_bf16"
            )
            corr = power = None
            # the per-candidate bin and neighbour powers come back from the
            # peak detector's chunk rows — no [T']-sized gathers
            (top_pow, top_idx, bi_sel, pa_sel, pc_sel, overflow) = (
                chunked_peak_detect(
                    best_pow, w, cfg.max_detections, cfg.power_threshold,
                    fresh_lo, fresh_hi, best_bin_flat,
                )
            )
        else:
            corr = self.correlate(x)  # [nb, T']
            power = jnp.abs(corr) ** 2  # [nb, T']
            best_pow = jnp.max(power, axis=0)  # [T']
            best_bin = jnp.argmax(power, axis=0).astype(jnp.int32)
            top_pow, top_idx, overflow = chunked_peak_detect(
                best_pow,
                w,
                cfg.max_detections,
                cfg.power_threshold,
                fresh_lo,
                fresh_hi,
            )
        tlen = best_pow.shape[0]
        cand_valid = top_pow > 0
        # ---------------- parameter estimation at candidates
        nb = self.num_bins
        bin_spacing = np.float32(np.pi / self.sync_len)
        ti = top_idx
        b = top_pow
        # ONE batched region fetch serves both candidate estimators: the
        # noise window [ti-w-16, ti+w+17) contains the syncword refinement
        # window [ti, ti+sync_len) — the fetch dominates the estimation
        # tail (~1.7 ms per fetch_regions call per 16ch x 2^19 step,
        # docs/PERF_R5.md), so acquire issues exactly one
        h = self._noise_filter
        k = h.size
        region = 2 * w + k  # conv support for the 2w+1 noise-window values
        tc2 = jnp.clip(ti - w - (k - 1) // 2, 0, x.shape[0] - region)
        from .fetch_pallas import fetch_enabled, fetch_regions

        if jax.default_backend() == "tpu" and fetch_enabled():
            wnr, wni = fetch_regions(x.real, x.imag, tc2, region)  # [D, R]
        else:
            wnr = jax.vmap(
                lambda t: jax.lax.dynamic_slice(x.real, (t,), (region,))
            )(tc2)
            wni = jax.vmap(
                lambda t: jax.lax.dynamic_slice(x.imag, (t,), (region,))
            )(tc2)
        if backend.startswith("fused"):
            # the kernel reduces to best-bin power only; adjacent-bin powers
            # and the complex value at the peak are recomputed exactly at
            # the <= D candidate points by direct correlation. The syncword
            # window is carved out of the fetched noise region by an exact
            # one-hot shift matmul: the offset ti - tc2 is w+16 except when
            # the region clipped at the buffer start, where valid
            # candidates sit in [w, w+16) (one-hot f32 selection must run
            # at Precision.HIGHEST — the default bf16 MXU multiply corrupts
            # f32 values even against an exact one-hot)
            bi = bi_sel
            ll = self.sync_len
            off = ti - tc2
            sh0, nsh = w, (k - 1) // 2 + 1
            stack_r = jnp.stack(
                [wnr[:, o : o + ll] for o in range(sh0, sh0 + nsh)], axis=1
            )  # [D, nsh, L]
            stack_i = jnp.stack(
                [wni[:, o : o + ll] for o in range(sh0, sh0 + nsh)], axis=1
            )
            onehot_s = (
                off[:, None] == jnp.arange(sh0, sh0 + nsh)[None]
            ).astype(jnp.float32)  # [D, nsh]
            hi = jax.lax.Precision.HIGHEST
            wr_c = jnp.einsum("ds,dsl->dl", onehot_s, stack_r, precision=hi)
            wi_c = jnp.einsum("ds,dsl->dl", onehot_s, stack_i, precision=hi)
            cr_pt, ci_pt, p3 = self._corr_points(
                x, bi, ti, windows=(wr_c, wi_c)
            )
            p_left, p_right = p3[:, 0], p3[:, 2]
            phase_raw = jnp.arctan2(ci_pt, cr_pt)
        else:
            bi = best_bin[ti]
            p_left = power[jnp.maximum(bi - 1, 0), ti]
            p_right = power[jnp.minimum(bi + 1, nb - 1), ti]
        interior = (bi > 0) & (bi < nb - 1)
        denom_f = 2.0 * (2.0 * b - (p_left + p_right))
        quad = jnp.clip(
            (p_right - p_left) / jnp.where(denom_f == 0, 1.0, denom_f), -0.5, 0.5
        )
        delta_freq = jnp.where(interior, quad * bin_spacing, 0.0)
        freq = (bi - cfg.freq_bins).astype(jnp.float32) * bin_spacing + delta_freq
        if not backend.startswith("fused"):
            from ..utils.cplx import cgather

            phase_raw = jnp.angle(cgather(corr, bi, ti))
        phase = phase_raw - delta_freq * 0.5 * np.float32(self.sync_len)
        phase = jnp.where(phase >= np.pi, phase - 2 * np.pi, phase)
        phase = jnp.where(phase < -np.pi, phase + 2 * np.pi, phase)
        # power peak interpolation: b + (c-a)^2 / (16 (b - (a+c)/2))
        # (syncword_detection.hpp:82-84); 16 (b - (a+c)/2) == 4 * denom_f
        p_interp = jnp.where(
            interior,
            b + (p_right - p_left) ** 2 / jnp.where(denom_f == 0, 1.0, 4.0 * denom_f),
            b,
        )
        amplitude = jnp.sqrt(jnp.maximum(p_interp, 0.0)) / np.float32(self.self_corr)
        # time interpolation from neighbour samples' own best-bin powers
        if pa_sel is not None:
            pa, pc = pa_sel, pc_sel
        else:
            pa = best_pow[jnp.maximum(ti - 1, 0)]
            pc = best_pow[jnp.minimum(ti + 1, tlen - 1)]
        denom_t = 2.0 * (2.0 * b - (pa + pc))
        time_est = jnp.clip(
            (pc - pa) / jnp.where(denom_t == 0, 1.0, denom_t), -0.5, 0.5
        )
        # noise power: mean power of the out-of-band (high-pass) component in
        # the CFAR window, scaled to full-band complex noise power — the same
        # quantity the reference reads off the central FFT bins. Computed
        # ONLY at the <= D candidate regions fetched above: the round-4 form
        # ran the 33-tap convolve + a cumsum over the ENTIRE buffer and cost
        # ~14 ms per 16-channel 2^19 step — 3x the correlator — while being
        # silently DCE'd in any program that dropped esn0 (PERF_R5.md). The
        # windowed values are numerically identical to the full-buffer
        # 'same' convolve for all eligible (interior) starts.
        # the 33-tap filter as unrolled shifted adds on the VPU: the
        # grouped-conv formulation costs ~ms per call on this backend
        # nearly independent of size (the round-3 finding that motivated
        # ops/matched_pallas.py), while the kernel here is SHARED across
        # rows so no per-group taps are needed at all
        h_rev = h[::-1].astype(np.float32)
        win = 2 * w + 1
        hp_r = np.float32(h_rev[0]) * wnr[:, 0:win]
        hp_i = np.float32(h_rev[0]) * wni[:, 0:win]
        for j in range(1, k):
            hp_r = hp_r + np.float32(h_rev[j]) * wnr[:, j : j + win]
            hp_i = hp_i + np.float32(h_rev[j]) * wni[:, j : j + win]
        pw = hp_r**2 + hp_i**2  # [D, 2w+1]
        noise_power = jnp.mean(pw, axis=1) / np.float32(self._noise_gain)
        noise_power = jnp.maximum(noise_power, 1e-12)
        sync_power = amplitude**2 * np.float32(self.self_corr)
        esn0 = 10.0 * jnp.log10(
            jnp.maximum(
                sync_power
                * np.float32(cfg.samples_per_symbol)
                / (noise_power * np.float32(self.sync_len)),
                1e-12,
            )
        )
        # sort by index, invalid last
        sort_key = jnp.where(cand_valid, ti, jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(sort_key)
        sel = lambda a: a[order]
        return Detections(
            index=sel(ti.astype(jnp.int32) + index0),
            valid=sel(cand_valid),
            amplitude=sel(amplitude.astype(jnp.float32)),
            phase=sel(phase.astype(jnp.float32)),
            freq=sel(freq.astype(jnp.float32)),
            freq_bin=sel((bi - cfg.freq_bins).astype(jnp.int32)),
            time_est=sel(time_est.astype(jnp.float32)),
            noise_power=sel(noise_power.astype(jnp.float32)),
            esn0_db=sel(esn0.astype(jnp.float32)),
            overflow=overflow,
        )


def chunked_peak_detect(
    best_pow: jax.Array,
    w: int,
    d: int,
    power_threshold: float,
    fresh_lo: jax.Array | None = None,
    fresh_hi: jax.Array | None = None,
    best_bin: jax.Array | None = None,
) -> tuple:
    """Windowed peak detection + CFAR as 3-4 fused passes over ``best_pow``
    (instead of ~24 log-doubling sliding-max passes — the detect tail was
    the HBM-bound stage of the roofline, docs/PERF_R3.md).

    Semantics (event-identical to the reference's running-best state
    machine, syncword_detection.hpp:267-298): sample ``t`` is a detection
    event iff its power is >= everything in the centered window
    ``[t-w, t+w]``, strictly > everything in ``[t-w, t-1]`` (first index
    wins ties), both window halves exist (``w <= t < tlen-w``), and at
    least half the window is below ``power/power_threshold`` (the CFAR
    median proxy). The final ``d`` slots go to the top-d passing events by
    power; ``overflow`` flags more passing events than slots.

    Decomposition: the window always covers ``t``'s whole w-sized chunk, so
    every event is its chunk's (first) argmax; with offset ``o = t - c*w``
    the remaining window parts are a suffix of chunk ``c-1`` from ``o``
    (strictly past -> strict >) and a prefix of chunk ``c+1`` through ``o``
    (future -> >=). Both are evaluated for ALL chunk candidates at once as
    offset-masked row reductions, and the CFAR below-count decomposes over
    the same three rows — a handful of elementwise passes over the
    ``[nch, w]`` chunk view with no gathers and no top-2d pool cutoff
    (every qualifying event competes for the ``d`` slots directly).

    Returns ``(top_pow [d], top_idx [d], overflow [])`` with empty slots
    marked by ``top_pow == -1``. With ``best_bin`` given, returns
    ``(top_pow, top_idx, top_bin, top_pa, top_pc, overflow)`` where
    ``top_bin`` is each candidate's best bin and ``top_pa``/``top_pc`` its
    neighbour samples' best powers (``best_pow[ti -/+ 1]``) — computed as
    offset-masked reductions over the chunk rows already in hand, so the
    estimation pass needs no gathers from the full-length planes
    (round 5: the [T']-sized candidate gathers sat on acquire's critical
    path).
    """
    tlen = best_pow.shape[0]
    nch = max(tlen // w, 1)
    pad_len = (nch + 1) * w - tlen
    neg = jnp.float32(-jnp.inf)
    bp_pad = jnp.concatenate(
        [best_pow, jnp.full((pad_len,), neg, best_pow.dtype)]
    )
    chunks = bp_pad.reshape(nch + 1, w)
    cur = chunks[:nch]  # [nch, w]
    nxt = chunks[1 : nch + 1]
    prv = jnp.concatenate(
        [jnp.full((1, w), neg, best_pow.dtype), chunks[: nch - 1]]
    )
    b = jnp.max(cur, axis=1)  # candidate powers [nch]
    o = jnp.argmax(cur, axis=1).astype(jnp.int32)[:, None]  # offsets
    ti = o[:, 0] + jnp.arange(nch, dtype=jnp.int32) * w  # global index
    off = jnp.arange(w, dtype=jnp.int32)[None, :]
    suff_prev = jnp.max(jnp.where(off >= o, prv, neg), axis=1)
    pref_next = jnp.max(jnp.where(off <= o, nxt, neg), axis=1)
    is_peak = (b > suff_prev) & (b >= pref_next)
    pos_ok = (ti >= w) & (ti < tlen - w)
    if fresh_lo is not None:
        pos_ok &= ti >= fresh_lo
    if fresh_hi is not None:
        pos_ok &= ti < fresh_hi
    # CFAR median proxy: the window [t-w, t+w] = suffix(c-1 from o) +
    # chunk c + prefix(c+1 through o); masked-out lanes contribute False.
    # (Candidates whose masks would touch the -inf padding are
    # edge-excluded by pos_ok.)
    thr = (b / power_threshold)[:, None]
    below = (
        jnp.sum(((prv < thr) & (off >= o)).astype(jnp.int32), axis=1)
        + jnp.sum((cur < thr).astype(jnp.int32), axis=1)
        + jnp.sum(((nxt < thr) & (off <= o)).astype(jnp.int32), axis=1)
    )
    hist_size = 2 * w + 1
    passing = is_peak & pos_ok & (b > 0) & (2 * below >= hist_size)
    # saturation flag: more qualifying detections than slots (the
    # reference degrades via stream backpressure; here excess detections
    # would silently vanish, so the condition is surfaced)
    overflow = jnp.sum(passing.astype(jnp.int32)) > d
    extras = []
    if best_bin is not None:
        # per-candidate estimation inputs as masked reductions over the
        # SAME chunk rows (no full-length gathers): the best bin at the
        # candidate, and the neighbour samples' best powers (offset o-1 is
        # in this chunk unless o==0 -> prev chunk's last; o+1 unless
        # o==w-1 -> next chunk's first). pos_ok excludes candidates whose
        # neighbours would touch the padding.
        bb_pad = jnp.concatenate(
            [best_bin, jnp.zeros((pad_len,), best_bin.dtype)]
        ).reshape(nch + 1, w)[:nch]
        bi_c = jnp.sum(jnp.where(off == o, bb_pad, 0), axis=1)
        # maximum(.., 0) sanitizes the -inf padding rows (only candidates
        # pos_ok already excludes touch them; keep their values finite so
        # no NaNs flow into the unused estimates of invalid slots)
        pa_c = jnp.sum(jnp.where(off == o - 1, cur, 0.0), axis=1) + (
            jnp.where(o[:, 0] == 0, jnp.maximum(prv[:, -1], 0.0), 0.0)
        )
        pc_c = jnp.sum(jnp.where(off == o + 1, cur, 0.0), axis=1) + (
            jnp.where(o[:, 0] == w - 1, jnp.maximum(nxt[:, 0], 0.0), 0.0)
        )
        extras = [bi_c, pa_c, pc_c]
    # final slots: top-d passing peaks by power
    score = jnp.where(passing, b, -1.0)
    if nch >= d:
        top_pow, sel = jax.lax.top_k(score, d)
        top_idx = ti[sel]
        extras = [a[sel] for a in extras]
    else:  # degenerate tiny buffers: fewer chunks than slots
        pad = d - nch
        top_pow = jnp.concatenate([score, jnp.full((pad,), -1.0)])
        top_idx = jnp.concatenate([ti, jnp.zeros((pad,), jnp.int32)])
        extras = [
            jnp.concatenate([a, jnp.zeros((pad,), a.dtype)]) for a in extras
        ]
    if best_bin is not None:
        return (top_pow, top_idx, *extras, overflow)
    return top_pow, top_idx, overflow
