"""Docs-vs-measurement pinning (round-5 verdict directive 5).

Round 4's front-door docs quoted round-3 best-of numbers while the
bench had moved to medians — the shop window drifted from the
measurement. This module derives every headline number from the
COMMITTED builder bench run (`tools/bench_r5_builder.json`, the same
JSON shape the driver's BENCH_rNN.json records) and asserts README.md,
docs/DESIGN.md §4 and BASELINE.md quote exactly those values, so a
future re-measure must update the JSON and the docs together or fail
CI.
"""

import json
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _texts():
    return ((ROOT / "README.md").read_text(),
            (ROOT / "docs" / "DESIGN.md").read_text(),
            (ROOT / "BASELINE.md").read_text())


def _cfg():
    return json.loads(
        (ROOT / "tools" / "bench_r5_builder.json").read_text())["config"]


def test_docs_quote_the_pinned_bench_medians():
    cfg = _cfg()
    readme, design, baseline = _texts()
    n, bb = cfg["n"], cfg["block_bytes"]
    total = n * bb

    def derived():
        enc_marg_s = total / cfg["marginal_gb_per_sec"] / 1e9
        gf16_marg_s = (2 * 8192 * 32768 * 2
                       / cfg["gf16_marginal_wire_gb_per_sec"] / 1e9)
        gf16w_marg_s = (2 * 8192 * 65536
                        / cfg["gf16_wiredomain_marginal_gb_per_sec"] / 1e9)
        gf32w_marg_s = (2 * cfg["gf32_wiredomain_k"] * 4096
                        / cfg["gf32_wiredomain_marginal_gb_per_sec"] / 1e9)
        return {
            # string -> docs that must carry it
            f"{total / cfg['seconds'] / 1e9:.1f} GB/s": (readme,),
            f"{cfg['seconds']:.3f} s": (readme, baseline),
            f"{cfg['parity_gb_per_sec']:.1f} parity": (readme,),
            f"{cfg['marginal_gb_per_sec']:.1f} GB/s": (readme, baseline),
            f"{enc_marg_s:.3f} s** ({cfg['marginal_gb_per_sec']:.1f} GB/s)":
                (design,),
            f"{cfg['ntt_2e20_marginal_seconds']:.3f} s": (readme, baseline),
            f"{cfg['decode_gb_per_sec']:.1f} GB/s": (readme, baseline),
            f"{cfg['decode_2e20_e2e19_seconds']:.3f} s** "
            f"({cfg['decode_gb_per_sec']:.1f} GB/s)": (design,),
            f"{gf16_marg_s:.4f} s "
            f"({cfg['gf16_marginal_wire_gb_per_sec']:.1f} wire GB/s)":
                (design,),
            f"{cfg['gf16_wiredomain_marginal_gb_per_sec']:.1f} GB/s":
                (readme,),
            f"{gf16w_marg_s:.4f} s "
            f"({cfg['gf16_wiredomain_marginal_gb_per_sec']:.1f} wire GB/s)":
                (design,),
            f"{cfg['gf16_wiredomain_marginal_gb_per_sec']:.1f} GB/s "
            "marginal": (baseline,),
            f"{cfg['gf32_wiredomain_marginal_gb_per_sec']:.1f} GB/s":
                (readme,),
            f"{gf32w_marg_s:.4f} s "
            f"({cfg['gf32_wiredomain_marginal_gb_per_sec']:.1f} wire GB/s)":
                (design,),
            f"{cfg['decode_wiredomain_gf16_marginal_gb_per_sec']:.1f} GB/s":
                (readme, design, baseline),
            f"{cfg['decode_wiredomain_gf32_marginal_gb_per_sec']:.1f} GB/s":
                (readme, design, baseline),
        }

    missing = [s for s, docs in derived().items()
               if any(s not in d for d in docs)]
    assert not missing, (
        "docs no longer quote the pinned bench run "
        f"(tools/bench_r5_builder.json); stale strings: {missing}")


def test_pinned_bench_run_is_complete():
    """The committed pin must itself be a COMPLETE run: every metric
    measured, no recorded errors, real chip (a degraded or partial run
    must never become the shop window)."""
    cfg = _cfg()
    assert cfg["backend_fallback"] is None and not cfg["fallback"]
    assert cfg["metric_errors"] is None
    assert cfg["device"].startswith("TPU")
    for key in ("marginal_gb_per_sec", "ntt_2e20_marginal_seconds",
                "decode_gb_per_sec", "gf16_marginal_wire_gb_per_sec",
                "gf16_wiredomain_marginal_gb_per_sec",
                "gf32_wiredomain_marginal_gb_per_sec",
                "decode_wiredomain_gf16_marginal_gb_per_sec",
                "decode_wiredomain_gf32_marginal_gb_per_sec"):
        assert cfg[key], f"pinned run missing {key}"
