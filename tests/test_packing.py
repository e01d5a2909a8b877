"""Concat-and-chunk sequence packing (distributed prefix sum)."""
from mopper_spark.textops.packing import pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_sequences_offsets_and_chunks(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c"),        # start 0, seqs 0..0 (seq_len 4)
            (2, "d e f g h"),    # start 3, seqs 0..1
            (3, ""),             # start 8, zero tokens -> NULL seqs
            (4, "i"),            # start 8, seq 2
        ],
    )
    out = {r.doc_id: r for r in pack_sequences(docs, seq_len=4, bucket_size=2).collect()}
    assert (out[1].start_tok, out[1].seq_first, out[1].seq_last) == (0, 0, 0)
    assert (out[2].start_tok, out[2].seq_first, out[2].seq_last) == (3, 0, 1)
    assert (out[3].n_tokens, out[3].seq_first, out[3].seq_last) == (0, None, None)
    assert (out[4].start_tok, out[4].seq_first, out[4].seq_last) == (8, 2, 2)


def test_pack_sequences_partitioning_invariant(spark):
    rows = [(i, " ".join(["t"] * ((i * 13) % 7 + 1))) for i in range(200)]
    a = sorted(map(tuple, pack_sequences(_docs(spark, rows).repartition(1), 32).collect()))
    b = sorted(map(tuple, pack_sequences(_docs(spark, rows).repartition(17), 32).collect()))
    assert a == b
    # offsets are a permutation-free exact scan: last doc's end == total tokens
    total = sum(((i * 13) % 7 + 1) for i in range(200))
    last = max(a, key=lambda r: r[0])
    assert last[2] + last[1] == total


def test_pack_sequences_bucket_integer_exact_past_2_53(spark):
    # doc_id beyond 2^53: float division would collapse to the double grid
    # (trunc(x/b) can land one bucket off); integer `div` must not.
    big = 2 ** 53 + 1
    docs = _docs(spark, [(big, "a b"), (big + 1, "c")])
    out = {r.doc_id: r for r in pack_sequences(docs, seq_len=4, bucket_size=1).collect()}
    # with bucket_size=1 each doc is its own bucket; float math would put
    # both ids in bucket 2^53 and the window tie-break could misorder them
    assert (out[big].start_tok, out[big + 1].start_tok) == (0, 2)
