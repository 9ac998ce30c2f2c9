"""Scale-proof corpus generators: the planted structure the SCALE10X
narrative relies on must actually hold — near-dup family members are
near (two REAL edits), never exact, and generation is deterministic and
partition-invariant (each row derives only from its id)."""

from __future__ import annotations

from ts2g2_spark import datagen


def test_documents_corpus_near_dups_are_never_exact(spark):
    docs = datagen.documents_corpus(spark, 120, num_partitions=3).collect()
    by_id = {r["doc_id"]: r["text"] for r in docs}
    assert len(by_id) == 120
    grp = datagen._FAMILY_GROUP
    k_dups = int(round(0.15 * grp))
    for g in range(120 // grp):
        base = by_id[g * grp].split()
        for m in range(1, k_dups):
            words = by_id[g * grp + m].split()
            diff = sum(a != b for a, b in zip(base, words))
            # exactly two distinct positions, each a REAL change
            assert diff == 2, (g, m, diff)


def test_documents_corpus_partition_invariant(spark):
    a = {r["doc_id"]: r["text"] for r in
         datagen.documents_corpus(spark, 60, num_partitions=1).collect()}
    b = {r["doc_id"]: r["text"] for r in
         datagen.documents_corpus(spark, 60, num_partitions=7).collect()}
    assert a == b
