"""ROLLUP/CUBE subtotal lattices (textops/olap.py)."""

import pytest


class TestRollupCube:
    def _df(self, spark):
        rows = [("a", "x", 1.25), ("a", "y", 2.5), ("a", "y", 0.75), ("b", "x", 4.0)]
        return spark.createDataFrame(rows, "t string, g string, value double")

    def test_rollup_lattice_and_gid(self, spark):
        from mopper_spark.textops.olap import rollup_metrics

        out = {
            (r.t, r.g, r.gid): (r.n, r.value_fp)
            for r in rollup_metrics(self._df(spark), ["t", "g"], "value").collect()
        }
        assert out[("a", "x", 0)] == (1, 125)
        assert out[("a", "y", 0)] == (2, 325)
        assert out[("b", "x", 0)] == (1, 400)
        assert out[("a", None, 1)] == (3, 450)   # per-t subtotal
        assert out[("b", None, 1)] == (1, 400)
        assert out[(None, None, 3)] == (4, 850)  # grand total
        assert len(out) == 6

    def test_cube_adds_per_g_slices(self, spark):
        from mopper_spark.textops.olap import cube_metrics

        out = {
            (r.t, r.g, r.gid): r.n
            for r in cube_metrics(self._df(spark), ["t", "g"]).collect()
        }
        # cube = rollup + the (None, g) slices with gid 2
        assert out[(None, "x", 2)] == 2
        assert out[(None, "y", 2)] == 2
        assert len(out) == 8

    def test_single_shuffle_expand_plan(self, spark):
        """The whole lattice is ONE Expand + aggregate, not one job per
        level — the reason rollup beats a union of group-bys at scale."""
        from mopper_spark.textops.olap import rollup_metrics

        plan = rollup_metrics(self._df(spark), ["t", "g"], "value")._jdf \
            .queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        import re

        assert plan.count("Expand") >= 1
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1

    def test_validation_and_partitioning_invariance(self, spark):
        from mopper_spark.textops.olap import rollup_metrics

        df = self._df(spark)
        with pytest.raises(ValueError):
            rollup_metrics(df, [])
        a = sorted(map(tuple, rollup_metrics(df, ["t", "g"], "value").collect()),
                   key=str)
        b = sorted(map(tuple, rollup_metrics(df.repartition(7), ["t", "g"],
                                             "value").collect()), key=str)
        assert a == b


class TestParetoFront2D:
    def _replica(self, pts):
        out = []
        for i, (xi, yi) in enumerate(pts):
            dominated = any(
                (xj >= xi and yj >= yi and (xj > xi or yj > yi))
                for j, (xj, yj) in enumerate(pts)
                if j != i
            )
            if not dominated:
                out.append((xi, yi))
        return sorted(out)

    def test_matches_bruteforce_replica(self, spark):
        from mopper_spark.textops.olap import pareto_front_2d

        pts = [((i * 13) % 97, (i * 29) % 89) for i in range(150)]
        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(pts)],
            "id long, x long, y long",
        )
        got = sorted((r.x, r.y) for r in pareto_front_2d(df, "x", "y").collect())
        assert got == self._replica(pts)

    def test_duplicates_and_ties_kept(self, spark):
        from mopper_spark.textops.olap import pareto_front_2d

        # (5,5) twice: neither dominates the other — both kept; (5,4) is
        # dominated by the equal-x higher-y points; (4,5) by equal-y
        # higher-x; (6,1) and (1,6) are corners of the front
        pts = [(1, 5, 5), (2, 5, 5), (3, 5, 4), (4, 4, 5), (5, 6, 1), (6, 1, 6)]
        df = spark.createDataFrame(pts, "id long, x long, y long")
        got = sorted(r.id for r in pareto_front_2d(df, "x", "y").collect())
        assert got == [1, 2, 5, 6]

    def test_bucket_width_invariance_and_validation(self, spark):
        import pytest

        from mopper_spark.textops.olap import pareto_front_2d

        pts = [(i, (i * 7) % 50, (i * 11) % 40) for i in range(120)]
        df = spark.createDataFrame(pts, "id long, x long, y long")
        a = sorted(tuple(r) for r in pareto_front_2d(df, "x", "y", bucket_width=1).collect())
        b = sorted(tuple(r) for r in pareto_front_2d(df, "x", "y", bucket_width=1000).collect())
        c = sorted(tuple(r) for r in pareto_front_2d(df.repartition(16), "x", "y").collect())
        assert a == b == c
        with pytest.raises(ValueError):
            pareto_front_2d(df, "x", "y", bucket_width=0)


class TestPivot:
    def _df(self, spark):
        rows = [
            ("d1", "click", 1.25), ("d1", "click", 0.5), ("d1", "view", 2.0),
            ("d2", "view", 4.0), ("d2", "error", 1.0), ("d2", "other", 9.0),
        ]
        return spark.createDataFrame(rows, "day string, et string, value double")

    def test_counts_sums_and_zero_fill(self, spark):
        from mopper_spark.textops.olap import pivot_metrics

        out = {
            r.day: r
            for r in pivot_metrics(
                self._df(spark), ["day"], "et", ["click", "view", "error"], "value"
            ).collect()
        }
        d1, d2 = out["d1"], out["d2"]
        assert (d1.click_n, d1.click_value_fp) == (2, 175)
        assert (d1.view_n, d1.view_value_fp) == (1, 200)
        assert (d1.error_n, d1.error_value_fp) == (0, 0)  # zero-filled hole
        assert (d2.click_n, d2.view_n, d2.error_n) == (0, 1, 1)
        # 'other' rows dropped up front, never a column
        assert not any(c.startswith("other") for c in out["d1"].asDict())

    def test_count_only_and_validation(self, spark):
        from mopper_spark.textops.olap import pivot_metrics

        out = pivot_metrics(self._df(spark), ["day"], "et", ["click"])
        assert out.columns == ["day", "click_n"]
        got = {r.day: r.click_n for r in out.collect()}
        assert got == {"d1": 2, "d2": 0}
        with pytest.raises(ValueError, match="at least one"):
            pivot_metrics(self._df(spark), ["day"], "et", [])
        with pytest.raises(ValueError, match="duplicate"):
            pivot_metrics(self._df(spark), ["day"], "et", ["a", "a"])

    def test_two_aggregate_plan_no_values_discovery_job(self, spark):
        """Explicit values → the two-aggregate PivotFirst plan: one
        event-scale Exchange on (day, et), one pair-scale Exchange on
        (day) — and no separate distinct-values collect job (building
        the plan triggers zero Spark jobs)."""
        from mopper_spark.textops.olap import pivot_metrics

        sc = spark.sparkContext
        tracker = sc.statusTracker()
        before = len(tracker.getJobIdsForGroup(None) or [])
        df = pivot_metrics(self._df(spark), ["day"], "et", ["click", "view"], "value")
        plan = df._jdf.queryExecution().executedPlan().toString()
        after = len(tracker.getJobIdsForGroup(None) or [])
        assert after == before  # no discovery job ran at plan time
        assert plan.count("Exchange") == 2
        assert "PivotFirst" in plan or "pivotfirst" in plan.lower()
