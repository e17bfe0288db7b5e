"""Pin the shipped kernel-default set, per family (VERDICT r3 item 1).

Every default below is backed by an interleaved on-chip A/B per recipe
family (docs/perf_roadmap.md "Round-4: per-family GEGLU-kernel A/Bs" and
"Round-4: per-family GN-kernel A/Bs"):

  kernel                      sd_v1.5      blip_diffusion   sdxl-turbo   default
  LN+GEGLU (SASPA_PALLAS_GEGLU)  +5.6%/+8.4%   +5.5%          wash (+0.4%)  ON
  GroupNorm (SASPA_PALLAS_GN)    -6.6% (OFF wins) OFF wins      wash (+0.1%)  OFF
  packed flash attention         +16.6%        (same UNet)     n/a short kv  ON

The defaults are deliberately GLOBAL (one value for every family): in every
family the measured deltas either agree in sign or are a wash, so
per-family gating would add config surface for zero measured benefit.  This
test is the tripwire for silently changing a default without re-running the
A/Bs — flip one only with fresh interleaved evidence, then update both the
roadmap tables and this pin.
"""

from __future__ import annotations

import pytest


KNOBS = [
    "SASPA_PALLAS_GEGLU",
    "SASPA_PALLAS_GN",
    "SASPA_DISABLE_PALLAS_GN",
    "SASPA_DISABLE_PALLAS",
    "SASPA_GN_FP32_NORM",
    "SASPA_LN_FP32_NORM",
    "SASPA_ATTN_MEGAKERNEL",
    "SASPA_PACKED_BLOCK_Q",
    "SASPA_CFG_FULL_BATCH",
    "SASPA_PALLAS_LN",
    "SASPA_SPLIT_SKIP_CONCAT",
]


@pytest.fixture()
def clean_env(monkeypatch):
    for k in KNOBS:
        monkeypatch.delenv(k, raising=False)


def test_default_kernel_set(clean_env):
    from saspa_tpu.utils import bench_conditions

    assert bench_conditions()["kernels"] == {
        "pallas_geglu": True,        # ON: +5.6/+8.4% sd_v1.5, +5.5% blip, wash turbo
        "cfg_shared_prefix": True,   # ON: removes real FLOPs (shared uncond prefix)
        "pallas_gn": False,          # OFF since r4: XLA GN fusions +6.6% sd_v1.5, wash turbo
        "gn_bf16_norm": True,        # bf16 normalize pass, fp32 stats (+1.2% r2)
        "ln_bf16_norm": True,
        "attn_megakernel": False,    # r3 interleaved: -2.7%
        "packed_block_q": "auto",
        "pallas_ln_one_pass": False,  # OFF: r5 interleaved -0.8% (fusion loss, like GN)
        "split_skip_concat": False,   # OFF pending/per the r5 interleaved A/B
    }


def test_default_gates_resolve(clean_env):
    """The trace-time gate functions agree with the pinned set."""
    from saspa_tpu.ops import attention, geglu, groupnorm

    assert geglu._enabled()
    assert groupnorm._disabled()
    assert not attention._disabled()


def test_env_knobs_override(clean_env, monkeypatch):
    from saspa_tpu.ops import geglu, groupnorm

    monkeypatch.setenv("SASPA_PALLAS_GEGLU", "0")
    assert not geglu._enabled()
    monkeypatch.setenv("SASPA_PALLAS_GN", "1")
    assert not groupnorm._disabled()
    # force-disable keeps highest precedence (A/B escape hatch)
    monkeypatch.setenv("SASPA_DISABLE_PALLAS_GN", "1")
    assert groupnorm._disabled()
