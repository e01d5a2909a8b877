"""Z-order (Morton) data layout (textops/layout.py)."""

import pytest


class TestZOrder:
    def test_known_interleave(self, spark):
        from mopper_spark.textops.layout import zorder_key

        df = spark.createDataFrame([(3, 1), (0, 0), (2, 3)], "x long, y long")
        got = [r.z for r in df.select(zorder_key(["x", "y"], bits=2).alias("z"))
               .collect()]
        # x bits at even positions, y bits at odd: (3,1)->0b0111, (2,3)->0b1110
        assert got == [7, 0, 14]

    def test_validation(self, spark):
        from mopper_spark.textops.layout import zorder_key, zorder_files

        with pytest.raises(ValueError):
            zorder_key(["x"], bits=4)
        with pytest.raises(ValueError):
            zorder_key(["x", "y"], bits=32)
        df = spark.createDataFrame([(1, 2)], "x long, y long")
        with pytest.raises(ValueError):
            zorder_files(df, ["x", "y"], n_files=1)

    def test_prunes_on_both_dimensions(self, spark):
        """A narrow filter on EITHER dimension touches a minority of the
        z-ordered files; a y-sorted layout would touch every file for an
        x-filter."""
        from mopper_spark.textops.layout import zorder_files

        pts = spark.createDataFrame(
            [(x, y) for x in range(32) for y in range(32)], "x long, y long"
        )
        out = zorder_files(pts, ["x", "y"], n_files=16, bits=5).collect()
        files = {}
        for r in out:
            files.setdefault(r.file_id, []).append((r.x, r.y))
        assert len(files) == 16
        for dim in (0, 1):
            touched = {
                fid for fid, rows in files.items()
                if any(4 <= p[dim] <= 5 for p in rows)
            }
            assert len(touched) <= 8, (dim, len(touched))
        # sanity: a y-sorted 16-file layout touches ALL files on an x-filter
        ysorted = sorted(((r.x, r.y) for r in out), key=lambda p: (p[1], p[0]))
        chunks = [ysorted[i * 64:(i + 1) * 64] for i in range(16)]
        assert sum(1 for ch in chunks if any(4 <= p[0] <= 5 for p in ch)) == 16

    def test_partitioning_invariance(self, spark):
        from mopper_spark.textops.layout import zorder_files

        pts = spark.createDataFrame(
            [(x % 17, (x * 7) % 23) for x in range(300)], "x long, y long"
        )
        a = sorted(map(tuple, zorder_files(pts, ["x", "y"], 8, bits=5).collect()))
        b = sorted(
            map(tuple, zorder_files(pts.repartition(9), ["x", "y"], 8, bits=5).collect())
        )
        assert a == b


class TestZoneMapStats:
    def test_stats_and_pruning(self, spark):
        from mopper_spark.textops.layout import zone_map_stats

        rows = [(0, 5), (0, 9), (1, 20), (1, 30), (2, None), (2, 7)]
        df = spark.createDataFrame(rows, "f int, v int")
        got = {r.file_id: (r.n_rows, r.n_nulls, r.min_v, r.max_v, r.prunable)
               for r in zone_map_stats(
                   df, "f", "v", predicate_lo=10, predicate_hi=15).collect()}
        assert got[0] == (2, 0, 5, 9, 1)      # max < lo: skip
        assert got[1] == (2, 0, 20, 30, 1)    # min > hi: skip
        assert got[2] == (2, 1, 7, 7, 0)      # has NULLs: never prunable

    def test_all_null_zone_sentinel_and_no_predicate(self, spark):
        from mopper_spark.textops.layout import zone_map_stats

        df = spark.createDataFrame([(0, None), (0, None)], "f int, v int")
        (r,) = zone_map_stats(df, "f", "v").collect()
        assert (r.n_nulls, r.min_v, r.max_v, r.prunable) == (2, -1, -1, 0)
