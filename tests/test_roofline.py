"""apm.utils.roofline: ops models, MFU conversion, scanner dispatch."""

import numpy as np

from apm.models.scanner import Scanner
from apm.utils.roofline import (
    PEAK_HBM,
    PEAK_MXU_BF16,
    PEAK_VPU_IOPS,
    band_model,
    corr_model,
    mfu_fields,
    model_for_scanner,
    myers_model,
)


def test_band_model_scales_with_k_and_m():
    a = band_model([50], 1)
    b = band_model([50], 4)
    assert b.vpu_ops / a.vpu_ops == (2 * 4 + 1) / (2 * 1 + 1)
    c = band_model([100], 1)
    assert c.vpu_ops == 2 * a.vpu_ops
    assert a.binding == "vpu" and a.mxu_flops == 0.0


def test_myers_model_k_independent():
    assert myers_model([50], 4).vpu_ops == myers_model([50], 4).vpu_ops
    assert myers_model([50], 4).binding == "vpu"


def test_corr_model_binding_and_roof():
    # DNA-ish: 6 patterns, m=50, S=16 fold -> w_kern_full=65, C=5 ->
    # B = n_bitplanes(5) = 3 ±1 planes (round 5).
    m = corr_model(6, 65, 5)
    assert m.mxu_flops == 2 * 6 * 65 * 3
    # The calibrated encode makes the VPU the binding resource at small N
    # (matches DESIGN §8: "bound by the VPU encode").
    assert m.binding == "vpu"
    # Roof = PEAK_VPU / (ENC_OPS_PER_ELEM * 3) — tracks the calibrated
    # per-element encode cost, ~14 GB/s at the one-hot-era 90 ops/elem.
    assert 8e9 < m.roof_bytes_per_s() < 25e9


def test_mfu_fractions_consistent():
    m = corr_model(64, 50, 5)
    f = m.mfu(2.2e9)
    assert abs(f["mfu_mxu"] - m.mxu_flops * 2.2e9 / PEAK_MXU_BF16) < 1e-12
    assert abs(f["mfu_vpu"] - m.vpu_ops * 2.2e9 / PEAK_VPU_IOPS) < 1e-12
    assert abs(f["hbm_frac"] - m.hbm_bytes * 2.2e9 / PEAK_HBM) < 1e-12
    assert 0 < f["mfu_mxu"] < 1 and 0 < f["mfu_vpu"] < 1


def test_model_for_scanner_routes_engines():
    # k=0 long patterns -> corr engine -> MXU flops present.
    sc0 = Scanner([b"A" * 50, b"C" * 50], 0)
    m0 = model_for_scanner(sc0, 64 << 20)
    assert m0 is not None and m0.mxu_flops > 0
    # k=5 short patterns -> banded/Myers DP -> pure VPU.
    sc5 = Scanner([b"ACGTACGTACGTACGTACGTACGT"], 5)
    m5 = model_for_scanner(sc5, 64 << 20)
    assert m5 is not None and m5.mxu_flops == 0 and m5.vpu_ops > 0
    # fields helper emits rounded values
    f = mfu_fields(sc0, 64 << 20, 2.0e9)
    assert set(f) == {
        "mfu_vpu", "mfu_mxu", "hbm_frac", "binding", "roof_mb_per_s"
    }


def test_mfu_fields_empty_on_zero_throughput():
    sc = Scanner([b"A" * 50], 0)
    assert mfu_fields(sc, 64 << 20, 0.0) == {}
