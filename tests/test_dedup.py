

class TestNfcExactDedup:
    def test_merges_normalization_variants(self, spark):
        from mopper_spark.textops.dedup import nfc_exact_dedup

        composed = "café"           # é as one codepoint
        decomposed = "café"        # e + combining acute
        rows = [
            (0, composed), (1, decomposed), (2, composed),
            (3, "other"), (4, "other"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.keep_id: (r.n_copies, r.n_raw_distinct)
            for r in nfc_exact_dedup(df).collect()
        }
        # NFC merges 0,1,2 (two raw-distinct forms); plain dedup merges 3,4
        assert got == {0: (3, 2), 3: (2, 1)}
