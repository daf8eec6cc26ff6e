"""Unit tests for bench.py's self-adjudication helpers — the rules
are documented in SCALE.md §"Adjudication rule"; these pin the math
so a refactor can't silently change what counts as a regression."""

import bench


def _bands(noise=1.0, entries=None):
    return {
        "noise_factor": noise,
        "entries": entries or {},
        "_file": "noise_bands_rTEST.json",
    }


def test_wide_band_derivation_and_fallback():
    bands = _bands(entries={
        "tight": {"min": 1.0, "max": 1.2},
        "wide": {"min": 0.2, "max": 0.4},     # 2.0x > 1.5x
        "edge": {"min": 1.0, "max": 1.5},     # exactly 1.5x: NOT wide
        "zero": {"min": 0.0, "max": 0.3},     # guarded: min 0 never divides
    })
    assert bench._wide_band(bands) == {"wide"}
    # no bands file yet -> the hardcoded LSH fallback pair
    assert bench._wide_band(None) == {"dedup_ngram_jaccard", "dedup_minhash_lsh"}


def test_adjudicate_band_ceiling_and_noise_floor():
    bands = _bands(noise=2.0, entries={"q": {"min": 0.5, "max": 1.0}})
    # band max normalized by ITS noise (1.0/2.0=0.5), +10% -> 0.55
    flags = bench._adjudicate({"q": 0.56}, noise=1.0, bands=bands)
    assert [f["entry"] for f in flags] == ["q"]
    assert flags[0]["ceiling_sec"] == 0.55
    assert bench._adjudicate({"q": 0.54}, noise=1.0, bands=bands) == []
    # a LOUD run divides its wall out; a QUIET run must NOT deflate it
    assert bench._adjudicate({"q": 1.0}, noise=2.0, bands=bands) == []
    loud_quiet = bench._adjudicate({"q": 0.56}, noise=0.5, bands=bands)
    assert [f["entry"] for f in loud_quiet] == ["q"]  # floor at 1.0


def test_adjudicate_canonical_fallback_and_unknown_entries():
    # no band row: 1.5x canonical ceiling; unknown entries are skipped
    name = "q1_pricing_summary"
    ceiling = bench.CANONICAL_SEC[name] * 1.5
    flags = bench._adjudicate({name: ceiling + 0.01, "not_a_row": 99.0}, 1.0, _bands())
    assert [f["entry"] for f in flags] == [name]
    assert flags[0]["band_source"] == "1.5x canonical"
