"""Compaction planning (textops/layout.py::compaction_plan)."""

import pytest


class TestCompactionPlan:
    def test_matches_running_total_and_partition_invariance(self, spark):
        from mopper_spark.textops.layout import compaction_plan

        rows = [("p1", i, 40 + (i * 13) % 50) for i in range(30)] + [
            ("p2", i, 200) for i in range(5)
        ]
        df = spark.createDataFrame(rows, "part string, seq long, bytes long")
        got = {
            (r.part, r.seq): (r.start_bytes, r.grp)
            for r in compaction_plan(df, "part", "seq", "bytes", 150,
                                     bucket_width=4).collect()
        }
        want = {}
        for p in ("p1", "p2"):
            run = 0
            for _, s, b in sorted(r for r in rows if r[0] == p):
                want[(p, s)] = (run, run // 150)
                run += b
        assert got == want
        # groups start at 0 and never decrease along seq WITHIN a
        # partition (an oversized file may skip ids — still one group)
        for p in ("p1", "p2"):
            grps = [g for (pp, _), (_, g) in sorted(got.items()) if pp == p]
            assert grps[0] == 0
            assert all(b >= a for a, b in zip(grps, grps[1:]))
        got2 = {
            (r.part, r.seq): (r.start_bytes, r.grp)
            for r in compaction_plan(df.repartition(7), "part", "seq", "bytes",
                                     150, bucket_width=64).collect()
        }
        assert got2 == got

    def test_validation(self, spark):
        from mopper_spark.textops.layout import compaction_plan

        df = spark.createDataFrame([("p", 0, 1)], "part string, seq long, bytes long")
        with pytest.raises(ValueError, match="target_bytes"):
            compaction_plan(df, "part", "seq", "bytes", 0)
