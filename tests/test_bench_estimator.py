"""Unit tests for bench.py's measurement estimators (no Spark).

Round 2 recorded a physically impossible scaling_efficiency of 1.571
(2-core leg in a slow host window, 8-core leg clean) and a negative
serial intercept of -15.9 s; these pin the plausibility gates that
keep such artifacts out of the recorded evidence.
"""

import bench


class TestPairRejection:
    def test_accepts_plausible_pair(self):
        assert bench._pair_rejection(0.78, 0.25, 0.27) is None

    def test_rejects_superlinear_efficiency(self):
        # the exact round-2 garbage pair: eff 1.571, canaries 0.287/0.345
        reason = bench._pair_rejection(1.571, 0.287, 0.345)
        assert reason is not None and "impossible" in reason

    def test_rejects_canary_mismatch(self):
        # legs straddling a host fast/slow transition (round-2's 0.438
        # pair had canaries 0.256 vs 0.388 — a 52% mismatch)
        reason = bench._pair_rejection(0.438, 0.256, 0.388)
        assert reason is not None and "canary" in reason

    def test_efficiency_at_one_allowed_within_noise(self):
        assert bench._pair_rejection(1.02, 0.30, 0.31) is None

    def test_low_efficiency_is_plausible(self):
        # low efficiency is a real (bad) result, not a measurement error
        assert bench._pair_rejection(0.35, 0.30, 0.31) is None

    def test_rejects_bandwidth_canary_mismatch(self):
        # round-3 failure mode the ALU canary cannot see: a bandwidth-
        # starved window hits only the wide leg (fast ALU canaries on
        # both legs, 0.315 efficiency); the DRAM canary catches the
        # transition when the legs' bandwidth readings diverge
        reason = bench._pair_rejection(0.5, 0.26, 0.27, 0.12, 0.31)
        assert reason is not None and "bandwidth" in reason

    def test_accepts_matching_bandwidth_canaries(self):
        assert bench._pair_rejection(0.78, 0.25, 0.27, 0.12, 0.13) is None

    def test_one_sided_blip_within_leg_does_not_reject(self):
        # legs are compared by their MIN reading (cleanest estimate);
        # a single slow sample inside one leg's before/after set is a
        # one-sided blip, not a window change between the legs — this
        # exact shape ([0.137, 0.091] vs [0.096, 0.098]) was falsely
        # rejected by the max/min-over-all-readings gate
        assert (
            bench._pair_rejection(
                0.53, [0.2, 0.26], [0.25, 0.24], [0.137, 0.091], [0.096, 0.098]
            )
            is None
        )

    def test_between_leg_window_change_still_rejected(self):
        reason = bench._pair_rejection(
            0.5, [0.2, 0.21], [0.45, 0.44], [0.1, 0.1], [0.1, 0.1]
        )
        assert reason is not None and "canary mismatch" in reason


class TestDegradedWindowGate:
    def test_pair_in_degraded_window_rejected_post_hoc(
        self, monkeypatch, tmp_path
    ):
        # round-3 v2 shape: internally-consistent pairs (matched
        # canaries, eff <= 1) measured inside a window delivering ~10%
        # of clean DRAM bandwidth — 8-core leg slower than 2-core.
        # The session's headline attempts saw a clean window (bw 0.11),
        # so the degraded pairs must be rejected post-hoc against it.
        legs = iter(
            [
                {"events_per_sec": 200_000.0, "host_canary_sec": 1.50,
                 "host_bw_canary_sec": 1.18},
                {"events_per_sec": 178_600.0, "host_canary_sec": 1.55,
                 "host_bw_canary_sec": 1.20},
            ]
        )
        monkeypatch.setattr(
            bench, "_replay_leg", lambda cpus, n_events, **kw: next(legs)
        )
        monkeypatch.setattr(
            bench,
            "_materialize_shared_tail",
            lambda n, w, tag: str(tmp_path / tag / "tail"),
        )
        monkeypatch.setattr(bench, "run_host_probe", lambda a, b: {})
        monkeypatch.setenv("SPARK_GRAFT_BENCH_SCALING_ROUNDS", "1")
        monkeypatch.setenv("SPARK_GRAFT_BENCH_SCALING_MAX_ROUNDS", "1")
        s = bench.ScalingSampler(1000)
        s.sample_pair()
        assert s.rounds[0]["rejected"] is None  # canaries match, eff ok
        res = s.finalize(extra_bw_canaries=[0.114, 1.1])
        assert res["scaling_efficiency"] is None
        assert "degraded" in res["rounds"][0]["rejected"]

    def test_uniform_slow_session_keeps_pairs(self, monkeypatch, tmp_path):
        # with no clean reference anywhere in the session, equally-slow
        # pairs are NOT rejected (nothing proves the window abnormal)
        legs = iter(
            [
                {"events_per_sec": 200_000.0, "host_canary_sec": 1.50,
                 "host_bw_canary_sec": 1.18},
                {"events_per_sec": 560_000.0, "host_canary_sec": 1.55,
                 "host_bw_canary_sec": 1.20},
            ]
        )
        monkeypatch.setattr(
            bench, "_replay_leg", lambda cpus, n_events, **kw: next(legs)
        )
        monkeypatch.setattr(
            bench,
            "_materialize_shared_tail",
            lambda n, w, tag: str(tmp_path / tag / "tail"),
        )
        monkeypatch.setattr(bench, "run_host_probe", lambda a, b: {})
        s = bench.ScalingSampler(1000)
        s.sample_pair()
        res = s.finalize(extra_bw_canaries=[1.15, 1.3])
        assert res["scaling_efficiency"] == 0.7


class TestWallSpreadGate:
    def test_mid_leg_transition_rejected(self):
        # clean legs measure ~10-12% spread between their two windows;
        # a leg that stalls mid-run (e.g. 18s then 60s) straddled a
        # host transition invisible to the before/after canaries
        reason = bench._wall_spread_rejection([54.8, 61.1], [18.2, 60.4])
        assert reason is not None and "mid-leg" in reason

    def test_consistent_walls_accepted(self):
        assert bench._wall_spread_rejection([54.8, 61.1], [18.2, 20.4]) is None

    def test_missing_or_single_walls_skipped(self):
        assert bench._wall_spread_rejection(None, [10.0]) is None


class TestHostProbe:
    def test_structure_and_efficiency_math(self, monkeypatch):
        # host delivers ALU ~linearly but DRAM only 1.6x from 2->8
        rates = {("alu", 2): 1.0, ("alu", 8): 3.9,
                 ("dram", 2): 1.0, ("dram", 8): 1.6}
        monkeypatch.setattr(
            bench, "_probe_scale", lambda kind, n: rates[(kind, n)]
        )
        out = bench.run_host_probe(2, 8)
        assert out["alu"]["efficiency"] == 0.975
        assert out["dram"]["efficiency"] == 0.4
        assert out["dram"]["speedup"] == 1.6
        assert out["alu"]["throughput_x2"] == 1.0


class TestSerialFit:
    def test_positive_intercept_kept(self):
        # wall = 2 + 3e-6 * events, exact
        pts = [(1_000_000, 5.0), (2_000_000, 8.0), (4_000_000, 14.0)]
        slope, intercept, clamped = bench._fit_serial(pts)
        assert not clamped
        assert abs(slope - 3e-6) < 1e-9
        assert abs(intercept - 2.0) < 1e-6

    def test_negative_intercept_clamped_to_origin_fit(self):
        # round-2 shape: the largest size contaminated upward makes the
        # naive fit intercept negative
        pts = [(1_000_000, 3.6), (2_000_000, 5.4), (4_000_000, 11.0),
               (8_000_000, 62.5)]
        slope, intercept, clamped = bench._fit_serial(pts)
        assert clamped
        assert intercept == 0.0
        assert slope > 0


class TestScalingSummary:
    def test_no_accepted_pairs_reports_none(self, monkeypatch, tmp_path):
        legs = iter(
            [
                {"events_per_sec": 115_000.0, "host_canary_sec": 0.287,
                 "host_bw_canary_sec": 0.12},
                {"events_per_sec": 723_000.0, "host_canary_sec": 0.345,
                 "host_bw_canary_sec": 0.12},
            ]
        )
        monkeypatch.setattr(
            bench, "_replay_leg", lambda cpus, n_events, **kw: next(legs)
        )
        monkeypatch.setattr(
            bench,
            "_materialize_shared_tail",
            lambda n, w, tag: str(tmp_path / tag / "tail"),
        )
        monkeypatch.setattr(bench, "run_host_probe", lambda a, b: {})
        monkeypatch.setenv("SPARK_GRAFT_BENCH_SCALING_ROUNDS", "1")
        monkeypatch.setenv("SPARK_GRAFT_BENCH_SCALING_MAX_ROUNDS", "1")
        res = bench.run_scaling(1000)
        assert res["scaling_efficiency"] is None
        assert res["rounds_rejected"] == 1
        assert res["rounds"][0]["rejected"] is not None
        # the least-bad raw pair is surfaced, clearly labelled
        assert res["unaccepted_best"]["efficiency"] == 1.572
        assert res["unaccepted_best"]["rejected"] is not None

    def test_best_and_median_over_accepted_only(self, monkeypatch, tmp_path):
        # 3 rounds: garbage 1.571, then accepted 0.70 and 0.82
        vals = iter(
            [
                (115_000.0, 0.287), (723_000.0, 0.345),   # eff 1.571 → rejected
                (200_000.0, 0.30), (560_000.0, 0.31),     # eff 0.70
                (200_000.0, 0.30), (656_000.0, 0.31),     # eff 0.82
            ]
        )
        def fake_leg(cpus, n_events, **kw):
            eps, canary = next(vals)
            return {"events_per_sec": eps, "host_canary_sec": canary,
                    "host_bw_canary_sec": 0.12}
        monkeypatch.setattr(bench, "_replay_leg", fake_leg)
        monkeypatch.setattr(
            bench,
            "_materialize_shared_tail",
            lambda n, w, tag: str(tmp_path / tag / "tail"),
        )
        monkeypatch.setattr(bench, "run_host_probe", lambda a, b: {})
        monkeypatch.setenv("SPARK_GRAFT_BENCH_SCALING_ROUNDS", "2")
        monkeypatch.setenv("SPARK_GRAFT_BENCH_SCALING_MAX_ROUNDS", "3")
        res = bench.run_scaling(1000)
        assert res["scaling_efficiency"] == 0.82
        assert res["scaling_efficiency_median"] == 0.76
        assert res["rounds_rejected"] == 1
        assert "best of 2 accepted" in res["scaling_efficiency_estimator"]


class TestCarryForward:
    """Round-keyed cross-run record carry (round-4 advisories: an
    all-time best must not mask a later round's regression; a malformed
    committed record must not crash the artifact write)."""

    def _prov(self, monkeypatch, rnd=5):
        monkeypatch.setattr(
            bench, "_PROVENANCE",
            {"git_head_at_run_start": "abc1234", "round": rnd},
        )

    def test_same_round_best_wins(self, monkeypatch):
        self._prov(monkeypatch)
        prev = {"pair": {"efficiency": 0.83}, "round": 5}
        new = {"pair": {"efficiency": 0.78}, "round": 5}
        best, prior = bench._carry_best(prev, new, bench._pair_score)
        assert best is prev and prior == []

    def test_prior_round_record_demoted_not_reported(self, monkeypatch):
        self._prov(monkeypatch)
        prev = {"pair": {"efficiency": 0.86}, "round": 4}
        new = {"pair": {"efficiency": 0.71}, "round": 5}
        best, prior = bench._carry_best(prev, new, bench._pair_score)
        assert best is new          # 0.86 is round-4 evidence, not round-5's
        assert prior == [prev]      # ... but it is archived, not lost

    def test_legacy_record_without_round_demoted(self, monkeypatch):
        self._prov(monkeypatch)
        prev = {"pair": {"efficiency": 0.839}}  # round-3-era shape
        best, prior = bench._carry_best(prev, None, bench._pair_score)
        assert best is None and prior == [prev]

    def test_malformed_record_archived_not_keyerror(self, monkeypatch):
        # ADVICE round-4: a prior record with "pair" but a renamed
        # efficiency key raised KeyError inside max() at artifact-write
        # time — after the whole bench had run
        self._prov(monkeypatch)
        prev = {"pair": {"eff_renamed": 0.9}, "round": 5}
        new = {"pair": {"efficiency": 0.7}, "round": 5}
        best, prior = bench._carry_best(prev, new, bench._pair_score)
        assert best is new and prior == [prev]

    def test_replay_bigger_events_beats_higher_rate(self, monkeypatch):
        self._prov(monkeypatch)
        big = {"events_per_sec": 700_000.0, "events": 16_000_000, "round": 5}
        smoke = {"events_per_sec": 950_000.0, "events": 500_000, "round": 5}
        best, prior = bench._carry_best(big, smoke, bench._replay_score)
        assert best is big and prior == []

    def test_pair_hunt_prior_round_archived(self, monkeypatch):
        self._prov(monkeypatch)
        hunt, prior = bench._carry_pair_hunt(
            {"pair_hunt": {"best_accepted": {"efficiency": 0.817}, "round": 4}}
        )
        assert hunt is None and len(prior) == 1
        hunt, prior = bench._carry_pair_hunt(
            {"pair_hunt": {"best_accepted": {"efficiency": 0.8}, "round": 5}}
        )
        assert hunt is not None and prior == []


class TestPrintBudget:
    def test_small_line_untouched(self):
        out = {"queries": {"q1": 1.0}, "scaling": {"pair_efficiencies": [0.8]}}
        fitted = bench._fit_budget(dict(out), limit=2000)
        assert fitted["scaling"]["pair_efficiencies"] == [0.8]
        assert "dropped_for_budget_see_detail_file" not in fitted

    def test_overflow_drops_optional_keys_never_queries(self):
        queries = {f"q{i}": 1.234 for i in range(30)}
        out = {
            "queries": queries,
            "cdc_replay": {"events_per_sec": 1.0,
                           "attempts_events_per_sec": [1.0] * 50},
            "scaling": {"scaling_efficiency": 0.8,
                        "pair_efficiencies": [0.8] * 80,
                        "host_ceiling_N_to_4N": {"alu": 1.0, "dram": 0.5}},
        }
        fitted = bench._fit_budget(out, limit=900)
        # the marker is included in the measurement, so the fitted line
        # itself respects the budget
        assert len(bench.json.dumps(fitted)) <= 900
        assert fitted["queries"] == queries  # per-query times survive
        assert "pair_efficiencies" not in fitted["scaling"]
        assert fitted["dropped_for_budget_see_detail_file"]

    def test_compact_pair_shape(self):
        rec = {
            "pair": {"efficiency": 0.82,
                     "local[2]_events_per_sec": 250_000.0,
                     "local[8]_events_per_sec": 820_000.0,
                     "canaries": [0.2] * 4, "bw_canaries": [0.1] * 4,
                     "window_walls": {"local[2]": [60, 61]},
                     "rejected": None},
            "cores": {"N": 2, "4N": 8}, "round": 5,
            "run_utc": "2026-08-18T00:00:00+00:00",
            "git_head_at_run_start": "abc1234", "n_events": 32_000_000,
        }
        c = bench._compact_pair(rec)
        assert c["efficiency"] == 0.82
        assert c["local[2]_events_per_sec"] == 250_000.0
        assert "canaries" not in c and "window_walls" not in c
        assert c["round"] == 5 and c["git_head_at_run_start"] == "abc1234"
