#!/usr/bin/env python3
"""Roofline / MFU sanity diagnostic for the RX pipeline (VERDICT r2 #7).

For the bench.py workload shape this prints, per receiver stage, the
estimated FLOPs and HBM bytes per step, the arithmetic intensity, the
roofline-implied floor time on the target chip, and — when measured stage
times are supplied (PROF_JSON=path to scripts/profile_rx.py output) — the
achieved fraction of the binding ceiling. It answers "which ceiling binds
this stage" so optimization effort goes against the right wall
(acquisition is HBM-bound at the fused-kernel level; the decode passes are
dominated by extraction HBM traffic scaling with C x D x region).

Chip model (defaults = TPU v5e single chip; override via env):
  PEAK_F32_TFLOPS   MXU f32 matmul peak (bf16 peak / 4)        [49.2]
  PEAK_VPU_TFLOPS   VPU f32 elementwise peak                   [1.9]
  HBM_GBPS          HBM bandwidth                              [819]

All numbers are per ONE step over the [channels x block] workload.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

PEAK_F32 = float(os.environ.get("PEAK_F32_TFLOPS", "49.2")) * 1e12
PEAK_VPU = float(os.environ.get("PEAK_VPU_TFLOPS", "1.9")) * 1e12
HBM = float(os.environ.get("HBM_GBPS", "819")) * 1e9


def stage_table(channels: int, block: int, max_det: int, freq_bins: int,
                max_payload_len: int = 1536):
    from gr4_packet_modem_tpu.models.receiver import Receiver, RxConfig

    rx = Receiver(
        RxConfig(
            max_payload_len=max_payload_len,
            max_detections=max_det,
            freq_bins=freq_bins,
        )
    )
    c = channels
    t = block
    acq = rx.acquirer
    n = acq.config.fft_size
    s = acq.stride
    nb = acq.num_bins
    ll = acq.sync_len
    k = rx.arm_len
    cd = c * max_det
    s_hdr = 192
    s_pay = rx.config.max_payload_syms
    sps = rx.config.samples_per_symbol
    r_hdr = sps * (s_hdr - 1) + k
    r_pay = sps * (s_pay - 1) + k
    f = c * (t // s)  # overlap-save frames per step
    lg = np.log2(n)

    stages = []

    def add(name, flops_mxu, flops_vpu, bytes_hbm, note):
        floor = max(flops_mxu / PEAK_F32 + flops_vpu / PEAK_VPU,
                    bytes_hbm / HBM)
        bound = ("HBM" if bytes_hbm / HBM >
                 flops_mxu / PEAK_F32 + flops_vpu / PEAK_VPU else "compute")
        stages.append({
            "stage": name,
            "gflops": round((flops_mxu + flops_vpu) / 1e9, 2),
            "hbm_mb": round(bytes_hbm / 1e6, 1),
            "intensity_flop_per_byte": round(
                (flops_mxu + flops_vpu) / max(bytes_hbm, 1), 2),
            "floor_ms": round(floor * 1e3, 3),
            "bound": bound,
            "note": note,
        })

    # acquisition, fused kernel: fwd FFT in XLA (HBM round trip), per-bin
    # product+iFFT+power reduced in VMEM (flops only), best_pow/bin out
    fft_flops = f * 5 * n * lg            # forward FFT (VPU/MXU mix; count VPU)
    perbin = f * nb * (6 * n + 5 * n * lg + 3 * n)
    acq_bytes = (
        f * n * 8            # frames read (c64)
        + f * n * 8 * 2      # FFT out + kernel frame read (c64)
        + f * s * (4 + 4)    # best_pow f32 + best_bin i32 out
    )
    add("acquire.correlate(fused)", 0.0, fft_flops + perbin, acq_bytes,
        f"{f} frames x {nb} bins, iFFT+power VMEM-resident")

    # detect tail: chunked peak + CFAR (offset-masked row reductions over
    # the [nch, w] chunk view: prev/cur/next rows read ~once each)
    passes = 4
    det_flops = c * t * 2 * passes
    det_bytes = c * t * 4 * passes
    add("acquire.detect", 0.0, det_flops, det_bytes,
        f"~{passes} fused chunk-reduction passes over best_pow")

    # header extraction: fetch regions + derotate + grouped conv
    ext_h_vpu = cd * r_hdr * 12                      # trig derotation
    ext_h_mxu = cd * 2 * 2 * k * s_hdr               # I/Q MACs
    ext_h_bytes = cd * r_hdr * 8 * 2 + cd * s_hdr * 8
    add("headers.extract", ext_h_mxu, ext_h_vpu, ext_h_bytes,
        f"{cd} regions x {r_hdr} samples")

    # header Costas + LDPC (VMEM-resident kernels)
    add("headers.costas", 0.0, cd * s_hdr * 20, cd * s_hdr * 8 * 2,
        "VMEM kernel, lane-packed")
    ldpc_mxu = cd * 25 * 10 * 2 * 128 * 128
    add("headers.ldpc", ldpc_mxu, cd * 25 * 128 * 40, cd * 128 * 4 * 2,
        "25 BP iters, [CD,128] batch")

    # payload extraction + V&V + bits/CRC
    ext_p_vpu = cd * r_pay * 12
    ext_p_mxu = cd * 2 * 2 * k * s_pay
    ext_p_bytes = cd * r_pay * 8 * 2 + cd * s_pay * 8
    add("payload.extract", ext_p_mxu, ext_p_vpu, ext_p_bytes,
        f"{cd} regions x {r_pay} samples — the C*D*region wall")
    add("payload.vv", 0.0, cd * s_pay * 15, cd * s_pay * 8 * 2,
        "feed-forward 4th-power blocks")
    crc_mxu = cd * 2 * 8 * max_payload_len * 32
    add("payload.bits+crc", crc_mxu, cd * s_pay * 10,
        cd * (2 * s_pay * 4 + max_payload_len), "GF(2) matmul CRC")

    return stages


def main():
    channels = int(os.environ.get("BENCH_CHANNELS", "16"))
    block = int(os.environ.get("BENCH_BLOCK", str(1 << 19)))
    max_det = int(os.environ.get("BENCH_MAXDET", "32"))
    bins = int(os.environ.get("BENCH_BINS", "4"))
    stages = stage_table(channels, block, max_det, bins)
    total_floor = sum(s["floor_ms"] for s in stages)
    measured = {}
    prof = os.environ.get("PROF_JSON")
    if prof:
        with open(prof) as fh:
            rows = [json.loads(ln) for ln in fh if ln.strip().startswith("{")]
        measured = {r["stage"]: r["ms_per_step"] for r in rows if "stage" in r}
    print(json.dumps({
        "config": {"channels": channels, "block": block,
                   "max_detections": max_det, "freq_bins": bins},
        "chip": {"peak_f32_tflops": PEAK_F32 / 1e12,
                 "peak_vpu_tflops": PEAK_VPU / 1e12, "hbm_gbps": HBM / 1e9},
        "roofline_floor_ms_total": round(total_floor, 3),
        "floor_msps": round(channels * block / (total_floor / 1e3) / 1e6, 1),
        "measured_stage_ms": measured,
    }))
    for st in stages:
        print(json.dumps(st))


if __name__ == "__main__":
    main()
