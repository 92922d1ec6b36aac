"""Index aliases: atomic pointer flips between index generations."""

import pytest

from koncorde_spark.fulltext import aliases


class TestAliasStore:
    def test_set_resolve_flip_drop(self, tmp_path):
        root = str(tmp_path / "idxroot")
        aliases.set_alias(root, "live", "/data/idx_v1")
        assert aliases.resolve_alias(root, "live") == "/data/idx_v1"
        aliases.set_alias(root, "live", "/data/idx_v2")
        assert aliases.resolve_alias(root, "live") == "/data/idx_v2"
        a = aliases.read_aliases(root)
        assert a["live"]["updated"] == 2  # generation advanced on flip
        aliases.set_alias(root, "staging", "/data/idx_v3")
        assert a["live"]["updated"] < aliases.read_aliases(root)["staging"]["updated"]
        aliases.drop_alias(root, "staging")
        with pytest.raises(KeyError):
            aliases.resolve_alias(root, "staging")
        with pytest.raises(KeyError):
            aliases.drop_alias(root, "staging")

    def test_generations_monotonic_across_drop(self, tmp_path):
        """A flip after a drop must never carry a lower generation than
        one an observer already saw (the stale-write-detection story)."""
        root = str(tmp_path / "genroot")
        for _ in range(5):
            last = aliases.set_alias(root, "a", "/v")
        aliases.set_alias(root, "b", "/w")
        seen = last["updated"]
        aliases.drop_alias(root, "a")
        again = aliases.set_alias(root, "a", "/v2")
        assert again["updated"] > seen
        assert "__gen__" not in aliases.read_aliases(root)
        with pytest.raises(ValueError):
            aliases.set_alias(root, "__gen__", "/x")

    def test_unknown_alias_is_loud(self, tmp_path):
        with pytest.raises(KeyError):
            aliases.resolve_alias(str(tmp_path), "nope")

    def test_invalid_names_rejected(self, tmp_path):
        for bad in ("", "a/b"):
            with pytest.raises(ValueError):
                aliases.set_alias(str(tmp_path), bad, "/x")

    def test_no_staged_residue(self, tmp_path):
        import os

        root = str(tmp_path / "r")
        aliases.set_alias(root, "a", "/x")
        aliases.set_alias(root, "b", "/y")
        assert sorted(os.listdir(root)) == ["aliases.json"]


@pytest.mark.spark
class TestAliasOpen:
    def test_flip_serves_new_generation(
        self, spark, small_corpus_pdf, bm25_index_dir, tmp_path_factory
    ):
        """The zero-downtime reindex flow: build v2 in a fresh dir, flip,
        and both tiers open the new generation — sidestepping the
        reader-reopen hazard of in-place rewrites."""
        from koncorde_spark.fulltext.indexer import IndexConfig, build_index

        root = str(tmp_path_factory.mktemp("aliasroot"))
        aliases.set_alias(root, "live", bm25_index_dir)
        v1 = aliases.open_local(root, "live")
        n1 = v1.count("import")
        assert n1 > 0

        v2_dir = str(tmp_path_factory.mktemp("idx_v2"))
        half = small_corpus_pdf.head(100)
        build_index(spark, spark.createDataFrame(half).repartition(2), v2_dir,
                    IndexConfig(n_shards=2), resume=False)
        aliases.set_alias(root, "live", v2_dir)

        local = aliases.open_local(root, "live")
        dist = aliases.open_index(spark, root, "live")
        assert local.count("import") < n1  # smaller corpus => fewer hits
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in dist.topk("import return", 5).collect()
        ]
        assert got == local.topk("import return", 5)
