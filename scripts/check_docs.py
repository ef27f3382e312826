"""Doc-vs-artifact consistency checker (VERDICT r4 weak #1 / next #4).

Round 3's lesson was "the contract is the artifact"; rounds 3 and 4 both shipped
prose numbers that contradicted the committed artifacts (ROADMAP's "val top-1
0.25" vs the log's acc 0.0000; "YUV +8%" vs +0.6-4% in the records). This script
enforces the rule mechanically: every headline number quoted in ROADMAP.md /
COMPONENTS.md must appear VERBATIM in the artifact it cites. Wired into the fast
test suite (tests/test_scripts_cli.py) so a drifting doc fails CI.

Each check: (doc file, artifact file, value extractor, format) — the formatted
artifact value must be a substring of the doc. Add a check whenever a doc gains
a number quoted from an artifact.

Usage: ``python scripts/check_docs.py`` (exit 1 + report on any mismatch).
"""

import json
import os as _os
import re
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def _detail(path: str) -> dict:
    with open(_os.path.join(ROOT, path)) as f:
        rec = json.load(f)
    if "parsed" in rec:  # driver-shape artifact (cmd/rc/tail/parsed)
        rec = rec["parsed"]
    return rec.get("detail", rec)


def _log_match(path: str, pattern: str) -> str:
    with open(_os.path.join(ROOT, path)) as f:
        text = f.read()
    m = re.search(pattern, text)
    if not m:
        raise AssertionError(f"{path}: pattern {pattern!r} not found")
    return m.group(1)


def _log_finished(path: str) -> bool:
    """A validation log is only an artifact once its run completed (rc=0 line) —
    an in-flight/aborted log must not crash the checker (the suite can run while
    a validation is still executing on the chip)."""
    try:
        with open(_os.path.join(ROOT, path)) as f:
            return "rc=0" in f.read()
    except OSError:
        return False


def checks() -> list[tuple[str, str, str]]:
    """Returns (doc, required substring, provenance) triples."""
    out: list[tuple[str, str, str]] = []
    full = "hw_checklist/bench_r4_full_record.json"
    if _os.path.exists(_os.path.join(ROOT, full)):
        d = _detail(full)
        for doc in ("ROADMAP.md", "COMPONENTS.md"):
            out += [
                (doc, f"{d['decode_240p_clips_per_sec']:.2f}", f"{full}#decode_240p_clips_per_sec"),
                (doc, f"{d['decode_yuv_240p_clips_per_sec']:.2f}", f"{full}#decode_yuv_240p_clips_per_sec"),
                (doc, f"{d['decode_fast_clips_per_sec']:.2f}", f"{full}#decode_fast_clips_per_sec"),
            ]
        out.append(("ROADMAP.md", f"{d['decode_clips_per_sec']:.2f}", f"{full}#decode_clips_per_sec"))
    bench = "BENCH_r04.json"
    if _os.path.exists(_os.path.join(ROOT, bench)):
        d = _detail(bench)
        out += [
            ("ROADMAP.md", f"{d['decode_240p_clips_per_sec']:.2f}", f"{bench}#decode_240p_clips_per_sec"),
            ("ROADMAP.md", f"{d['h2d_MB_per_sec']:.1f}", f"{bench}#h2d_MB_per_sec"),
        ]
    log = "hw_checklist/validate_adversarial_reference_r4.log"
    if _log_finished(log):
        raw = _log_match(log, r"privacy cMAP raw:\s+([0-9.]+)")
        anon = _log_match(log, r"privacy cMAP anonymized:\s+([0-9.]+)")
        out += [
            ("ROADMAP.md", raw, f"{log}#cMAP_raw"),
            ("ROADMAP.md", anon, f"{log}#cMAP_anonymized"),
        ]
    # Round-5 artifacts, when they exist, replace the r4 claims in the docs.
    log5 = "hw_checklist/validate_adversarial_reference_r5.log"
    if _log_finished(log5):
        raw = _log_match(log5, r"privacy cMAP raw:\s+([0-9.]+)")
        anon = _log_match(log5, r"privacy cMAP anonymized:\s+([0-9.]+)")
        out += [
            ("ROADMAP.md", raw, f"{log5}#cMAP_raw"),
            ("ROADMAP.md", anon, f"{log5}#cMAP_anonymized"),
        ]
    t2d = "hw_checklist/exp_ft_stem_t2d_r5.log"
    if _log_finished(t2d):
        cur = _log_match(t2d, r"current_122:\s+([0-9.]+) ms")
        rebin = _log_match(t2d, r"t2d_222:\s+([0-9.]+) ms")
        out += [
            ("ROADMAP.md", cur, f"{t2d}#current_122_ms"),
            ("ROADMAP.md", rebin, f"{t2d}#t2d_222_ms"),
        ]
    qexp = "hw_checklist/exp_int8_conv_r5.log"
    if _log_finished(qexp):
        bf = _log_match(qexp, r"conv 224x224 32->32 .*?bf16 ([0-9.]+) ms")
        i8 = _log_match(qexp, r"conv 224x224 32->32 .*?int8 ([0-9.]+) ms")
        rq = _log_match(qexp, r"conv 224x224 32->32 .*?int8_requant ([0-9.]+) ms")
        out += [
            ("ROADMAP.md", bf, f"{qexp}#conv224_bf16_ms"),
            ("ROADMAP.md", i8, f"{qexp}#conv224_int8_ms"),
            ("ROADMAP.md", rq, f"{qexp}#conv224_int8_requant_ms"),
        ]
    qup2 = "hw_checklist/exp_int8_up2_r5.log"
    if _log_finished(qup2):
        bf = _log_match(qup2, r"up2 112x112 64->32 .*?bf16_dilated ([0-9.]+) ms")
        i8 = _log_match(qup2, r"up2 112x112 64->32 .*?int8_dilated ([0-9.]+) ms")
        out += [
            ("ROADMAP.md", bf, f"{qup2}#up2_112_bf16_ms"),
            ("ROADMAP.md", i8, f"{qup2}#up2_112_int8_ms"),
        ]
    qb = "hw_checklist/bench_quant_r5.log"
    if _log_finished(qb):
        for pat, tag in [
            (r"bf16  fused b16:\s+([0-9.]+) ms", "bf16_ms"),
            (r"bf16  fused b16:.*?([0-9.]+) clips/s", "bf16_rate"),
            (r"int8-fa    fused b16:\s+([0-9.]+) ms", "int8_fa_ms"),
            (r"int8-fa\+ft fused b16:\s+([0-9.]+) ms", "int8_faft_ms"),
            (r"int8-fa\+ft fused b16:.*?([0-9.]+) clips/s", "int8_faft_rate"),
            (r"feature cossim vs bf16: ([0-9.]+)", "cossim"),
            (r"fa bf16 fused      :\s+([0-9.]+) ms", "fa_bf16_ms"),
            (r"fa int8 \(up2 bf16\) :\s+([0-9.]+) ms", "fa_int8_ms"),
            (r"fa int8 \(up2 int8\) :\s+([0-9.]+) ms", "fa_int8_up2_ms"),
            (r"ft bf16 fast stem  :\s+([0-9.]+) ms", "ft_bf16_ms"),
            (r"ft int8 \(stem bf16\):\s+([0-9.]+) ms", "ft_int8_ms"),
            (r"ft int8 \(stem int8\):\s+([0-9.]+) ms", "ft_int8_stem_ms"),
        ]:
            out.append(("ROADMAP.md", _log_match(qb, pat), f"{qb}#{tag}"))
        for pat, tag in [
            (r"int8-fa\+ft fused b16:.*?([0-9.]+) clips/s", "int8_faft_rate"),
            (r"feature cossim vs bf16: ([0-9.]+)", "cossim"),
        ]:
            out.append(("README.md", _log_match(qb, pat), f"{qb}#{tag}"))
    r5rec = "hw_checklist/bench_r5_record.json"
    if _os.path.exists(_os.path.join(ROOT, r5rec)):
        d = _detail(r5rec)
        out += [
            ("ROADMAP.md", f"{d['quant_int8_clips_per_sec']:.3f}", f"{r5rec}#quant_int8_clips_per_sec"),
            ("ROADMAP.md", f"{d['quant_int8_vs_baseline']:.2f}", f"{r5rec}#quant_int8_vs_baseline"),
            ("ROADMAP.md", f"{d['quant_int8_feature_cossim_vs_bf16']:.5f}", f"{r5rec}#quant_int8_feature_cossim_vs_bf16"),
            ("ROADMAP.md", f"{d['batched_fused_clips_per_sec']:.3f}", f"{r5rec}#batched_fused_clips_per_sec"),
            ("ROADMAP.md", f"{d['mfu_of_ceiling']:.3f}", f"{r5rec}#mfu_of_ceiling"),
        ]
        with open(_os.path.join(ROOT, r5rec)) as f:
            top = json.load(f)
        out.append(("ROADMAP.md", f"{top['vs_baseline']:.3f}", f"{r5rec}#vs_baseline"))
    anat = "hw_checklist/block_anatomy.json"
    if _os.path.exists(_os.path.join(ROOT, anat)):
        with open(_os.path.join(ROOT, anat)) as f:
            a = json.load(f)
        out.append(("ROADMAP.md", f"{a['mfu_ceiling_computed']:.4f}", f"{anat}#mfu_ceiling_computed"))
        out.append(("ROADMAP.md", f"{a['blocks']['fa_decoder']['ms']:.2f}", f"{anat}#blocks.fa_decoder.ms"))
        out.append(("ROADMAP.md", f"{a['unattributed_ms']:.2f}", f"{anat}#unattributed_ms"))
    return out


def main() -> int:
    docs: dict[str, str] = {}
    failures = []
    for doc, needle, provenance in checks():
        if doc not in docs:
            with open(_os.path.join(ROOT, doc)) as f:
                docs[doc] = f.read()
        # Number-boundary match: "0.53" must not be satisfied by "10.53".
        if not re.search(r"(?<![0-9.])" + re.escape(needle) + r"(?![0-9])", docs[doc]):
            failures.append(f"{doc}: missing verbatim value {needle!r} from {provenance}")
    if failures:
        print("\n".join(failures))
        print(f"\n{len(failures)} doc/artifact mismatches — docs must quote artifacts verbatim")
        return 1
    print(f"check_docs OK: {len(checks())} quoted values match their artifacts")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
