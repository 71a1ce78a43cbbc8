"""Roofline / MFU accounting: relate measured bytes/s to chip peaks.

The reference recorded kernel-level timings against hardware
configurations (``experiments/experiments.xlsx`` "threadsPerBlock
determination"); this module is that discipline made explicit for TPU —
every engine gets an ops/byte model, and a measured corpus throughput
converts into the fraction of the binding resource's peak it achieves
(``mfu_vpu`` / ``mfu_mxu`` / ``hbm_frac``). bench.py and bench/sweep.py
attach these next to every MB/s figure so a number like "1 GB/s at k=1"
is judged against what the silicon allows, not just against round 1.

Peaks are the public v5e single-chip figures (the testbed chip):

* MXU: 197 TFLOP/s bf16 (the systolic array; int8 is 394 TOPS but the
  corr engines measured *slower* in int8 — DESIGN.md §8).
* VPU: ~3.9 T int-ops/s — 8 sublanes x 128 lanes x 4 ALUs x ~940 MHz.
  The banded/Myers DP kernels and the one-hot encode ride this unit.
* HBM: 819 GB/s.

Ops models (per corpus byte == per window start; P = real patterns):

* banded DP: ~5 VPU ops per live diagonal per step -> 5*(2k+1)*m per
  (window, pattern) — the add/min/compare chain of the band recurrence
  (apm/ops/pallas_kernel.py, classic band).
* Myers bit-parallel band: ~(2C + 25) ops per step per (window,
  pattern) — C text-channel compares + C PEQ selects + ~15 bit ops +
  carry bookkeeping, independent of k (DESIGN.md §1b).
* corr / conv phase 1 (MXU): 2 * N * w_kern_full * B FLOPs per byte,
  where N is base output channels (patterns or pieces), w_kern_full
  includes the shift-fold widening (m + S - 1), and B = n_bitplanes(C)
  is the ±1 code-bit channel count (2 for DNA — round 5 halved the
  channel axis vs one-hot). Its VPU side is the bit-plane encode,
  calibrated against the measured encode-only floor (ENC_OPS_PER_ELEM;
  DESIGN.md §8).
* HBM: uint8 read + (for conv engines) bit-plane write+read at bf16:
  ~(1 + 4*B) bytes of traffic per corpus byte.

These are *models*, good to ~2x — their value is telling "8x from the
roof" apart from "at the roof", which MB/s alone cannot.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Sequence

# Public single-chip v5e peaks.
PEAK_MXU_BF16 = 197e12  # FLOP/s
PEAK_VPU_IOPS = 3.9e12  # int/bool vector ops/s (8 x 128 x 4 x ~940 MHz)
PEAK_HBM = 819e9  # bytes/s

# Calibrated VPU cost of the one-hot encode, in effective lane-ops per
# one-hot OUTPUT ELEMENT. The naive model (1 compare + 1 convert) predicts
# a ~90 GB/s encode roof; the measured encode-only floor is 8.4 GB/s at
# C = 5 channels (bench/corr_probe.py, DESIGN.md §8) — i.e. ~90 effective
# ops per bf16 element once Mosaic's uint8 widening, broadcast compare,
# bf16 pack, and relayouts are counted. Calibrating against the repo's
# own microbenchmark keeps the conv engines' rooflines honest: their
# binding resource IS this encode, not the MXU contraction.
ENC_OPS_PER_ELEM = 90.0


@dataclass(frozen=True)
class OpsModel:
    """Per-corpus-byte cost model for one engine configuration."""

    vpu_ops: float  # VPU int/bool ops per corpus byte
    mxu_flops: float  # MXU FLOPs per corpus byte
    hbm_bytes: float  # HBM traffic (bytes) per corpus byte
    binding: str  # which resource the model says binds first

    def mfu(self, bytes_per_s: float) -> Dict[str, float]:
        """Measured fractions of each peak at a measured throughput."""
        out = {
            "mfu_vpu": self.vpu_ops * bytes_per_s / PEAK_VPU_IOPS,
            "mfu_mxu": self.mxu_flops * bytes_per_s / PEAK_MXU_BF16,
            "hbm_frac": self.hbm_bytes * bytes_per_s / PEAK_HBM,
            "binding": self.binding,
        }
        out["roof_mb_per_s"] = self.roof_bytes_per_s() / 1e6
        return out

    def roof_bytes_per_s(self) -> float:
        """Throughput at which the first resource saturates."""
        roofs = []
        if self.vpu_ops > 0:
            roofs.append(PEAK_VPU_IOPS / self.vpu_ops)
        if self.mxu_flops > 0:
            roofs.append(PEAK_MXU_BF16 / self.mxu_flops)
        if self.hbm_bytes > 0:
            roofs.append(PEAK_HBM / self.hbm_bytes)
        return min(roofs) if roofs else float("inf")


def _pick_binding(vpu: float, mxu: float, hbm: float) -> str:
    t = {
        "vpu": vpu / PEAK_VPU_IOPS,
        "mxu": mxu / PEAK_MXU_BF16,
        "hbm": hbm / PEAK_HBM,
    }
    return max(t, key=t.get)


def band_model(plens: Sequence[int], k: int) -> OpsModel:
    """Classic banded DP: 5 ops x (2k+1) diagonals x m steps per pattern."""
    vpu = sum(5.0 * (2 * k + 1) * m for m in plens if m > 0)
    hbm = 1.0  # text read; DP state lives in VMEM/vregs
    return OpsModel(vpu, 0.0, hbm, _pick_binding(vpu, 0.0, hbm))


def myers_model(plens: Sequence[int], alphabet_size: int) -> OpsModel:
    """Bit-parallel band: ~(2C + 25) ops per step, independent of k."""
    c = max(alphabet_size, 1)
    vpu = sum((2.0 * c + 25.0) * m for m in plens if m > 0)
    hbm = 1.0
    return OpsModel(vpu, 0.0, hbm, _pick_binding(vpu, 0.0, hbm))


def corr_model(
    n_base: int, w_kern_full: int, alphabet_size: int
) -> OpsModel:
    """k = 0 correlation / conv phase 1 on the MXU.

    ``n_base`` = base output channels (patterns for ``scan_corr_mxu``,
    total pieces for ``scan_pieces_conv``); ``w_kern_full`` = conv kernel
    width INCLUDING the shift-fold widening (m + S - 1). FLOPs per byte
    are stride-invariant given the full width: outputs/byte = n_base,
    each 2 * w_kern_full * B FLOPs, where B = n_bitplanes(C) is the ±1
    bit-plane channel count (round 5: the channel axis carries code bits,
    not one-hot symbols — DESIGN.md §8).
    """
    from ..ops.corr_engine import n_bitplanes

    b = n_bitplanes(alphabet_size)
    mxu = 2.0 * n_base * w_kern_full * b
    vpu = ENC_OPS_PER_ELEM * b  # bit-plane encode (calibrated, see above)
    hbm = 1.0 + 4.0 * b  # uint8 read + bf16 plane write + read
    return OpsModel(vpu, mxu, hbm, _pick_binding(vpu, mxu, hbm))


# Calibrated VPU-side cost of the fused Pallas correlation, in effective
# lane-ops per corpus byte at small P. The written op count (~30/byte:
# widen, rolls, encodes, epilogue) predicts a >100 GB/s VPU side; the
# best measured small-P steady state is 13.8 GB/s (512 MB P = 6,
# healthy-link session 2026-08-20T23:01Z, bench/headline_r5_tpu.jsonl)
# — i.e. ~270 effective ops/byte once Mosaic's relayouts, iota/mask
# arithmetic and per-step scheduling are counted. (An earlier 400-op
# calibration came from a degraded session and put measured mfu_vpu at
# 1.44 — calibrate against the best session, not the sickest.) Below
# ~P = 20 the fused kernel is bound by this in-kernel overhead, above
# it by the MXU contraction (P = 64 measured at 59-65% of its roof).
FUSED_OPS_PER_BYTE = 270.0


def fused_corr_model(p_slots: int, alphabet_size: int) -> OpsModel:
    """Fused Pallas correlation (apm.ops.corr_fused): per-byte MACs are
    ``128 * B * P`` (one K-tile per phase, 64 window phases folded into
    columns); the VPU side is the calibrated in-kernel overhead
    (FUSED_OPS_PER_BYTE) plus the per-pattern epilogue compare/mask."""
    from ..ops.corr_engine import n_bitplanes

    b = n_bitplanes(alphabet_size)
    mxu = 2.0 * 128 * b * p_slots
    vpu = FUSED_OPS_PER_BYTE + 4.0 * p_slots
    hbm = 1.0  # uint8 text read; everything else lives in VMEM
    return OpsModel(vpu, mxu, hbm, _pick_binding(vpu, mxu, hbm))


def filter_shiftor_model(plens: Sequence[int], k: int) -> OpsModel:
    """Pigeonhole shift-OR phase 1: ~2 ops per pattern char per window
    (AND-chain), plus ~6 ops per piece for the shifted-OR combine."""
    vpu = 0.0
    for m in plens:
        if m <= 0:
            continue
        vpu += 2.0 * m + 6.0 * (k + 1)
    hbm = 1.0
    return OpsModel(vpu, 0.0, hbm, _pick_binding(vpu, 0.0, hbm))


def model_for_scanner(scanner, n: int) -> Optional[OpsModel]:
    """Ops model for the engine an actual Scanner would pick for an
    ``n``-byte scan (via ``make_plan``), summed over its engine split.
    Returns None when the scan has no device path (e.g. XLA backend)."""
    from ..models.pipeline import make_plan
    from ..ops.pallas_kernel import resolve_dp_mode

    try:
        plan = make_plan(scanner, n, "pallas")
    except Exception:
        return None
    c = len(scanner._corr_alphabet())
    vpu = mxu = 0.0
    hbm = 1.0
    if plan.use_corr:
        if scanner._use_fused_corr(plan.wf, plan.halo):
            from ..ops.corr_fused import S_FUSED

            km, _thr = scanner._corr_fused_tables()
            m = fused_corr_model(km.shape[1] // S_FUSED, c)
        else:
            kern, thr, stride = scanner._corr_kernel()
            m = corr_model(kern.shape[2] // stride, kern.shape[0], c)
        vpu += m.vpu_ops
        mxu += m.mxu_flops
        hbm = max(hbm, m.hbm_bytes)
    if plan.any_filter:
        if plan.fp1_conv:
            if scanner._use_fused_corr(plan.wf, plan.halo):
                from ..ops.corr_fused import S_FUSED

                km, _t, _o = scanner._fp1_fused_tables(plan.plens_filter)
                m = fused_corr_model(km.shape[1] // S_FUSED, c)
            else:
                pk, pt, ow, s = scanner._fp1_kernel(plan.plens_filter)
                m = corr_model(ow.shape[0], pk.shape[0], c)
            vpu += m.vpu_ops
            mxu += m.mxu_flops
            hbm = max(hbm, m.hbm_bytes)
        else:
            m = filter_shiftor_model(plan.plens_filter, scanner.k)
            vpu += m.vpu_ops
    if plan.any_dp:
        _, impl = resolve_dp_mode(
            scanner.k, scanner._dp_alphabet(), scanner.config.dp_dtype,
            scanner.config.dp_impl, len(plan.plens_dp), scanner.m_max,
        )
        m = (
            myers_model(plan.plens_dp, c)
            if impl == "myers"
            else band_model(plan.plens_dp, scanner.k)
        )
        vpu += m.vpu_ops
    if vpu == 0.0 and mxu == 0.0:
        return None
    return OpsModel(vpu, mxu, hbm, _pick_binding(vpu, mxu, hbm))


def mfu_fields(scanner, n: int, bytes_per_s: float) -> Dict[str, float]:
    """Rounded MFU fields for a bench record (empty when no model)."""
    m = model_for_scanner(scanner, n)
    if m is None or bytes_per_s <= 0:
        return {}
    f = m.mfu(bytes_per_s)
    return {
        "mfu_vpu": round(f["mfu_vpu"], 4),
        "mfu_mxu": round(f["mfu_mxu"], 4),
        "hbm_frac": round(f["hbm_frac"], 4),
        "binding": f["binding"],
        "roof_mb_per_s": round(f["roof_mb_per_s"], 1),
    }
