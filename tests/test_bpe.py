"""BPE training/encoding: the classic hand-worked example + invariants."""

import pandas as pd
import pytest

from koncorde_spark.pipeline.bpe import (
    END,
    bpe_encode,
    bpe_train,
    bpe_train_from_frequencies,
    encode_word,
)


class TestMergeLoop:
    # Sennrich et al. 2016's worked example vocabulary
    FREQ = {"low": 5, "lower": 2, "newest": 6, "widest": 3}

    def test_classic_example_first_merges(self):
        merges = bpe_train_from_frequencies(self.FREQ, 4)
        # 'es' appears 9x (newest+widest) — the top pair; then 'est' 9x,
        # then 'est</w>' 9x; 'lo' 7x comes after
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t")
        assert merges[2] == ("est", END)
        assert merges[3] == ("l", "o")

    def test_deterministic_tie_break(self):
        # every pair count equal -> lexicographically smallest merges first
        merges = bpe_train_from_frequencies({"ab": 2, "cd": 2}, 1)
        assert merges == [("a", "b")]

    def test_stops_when_no_pair_repeats(self):
        merges = bpe_train_from_frequencies({"ab": 1, "cd": 1}, 10)
        assert merges == []  # every pair occurs once — nothing to gain

    def test_encode_word_roundtrip(self):
        merges = bpe_train_from_frequencies(self.FREQ, 6)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in self.FREQ:
            sym = encode_word(w, ranks)
            assert "".join(sym) == w + END  # lossless segmentation
        assert encode_word("newest", ranks) == ["newest" + END] or len(
            encode_word("newest", ranks)
        ) < len("newest") + 1  # compression happened


@pytest.mark.spark
class TestDistributed:
    def test_train_and_encode(self, spark):
        pdf = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "low low low low low lower lower",
                    "newest newest newest newest newest newest",
                    "widest widest widest",
                ],
            }
        )
        df = spark.createDataFrame(pdf)
        merges = bpe_train(df, 4)
        assert merges == bpe_train_from_frequencies(
            {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 4
        )
        rows = {
            int(r["doc_id"]): r for r in bpe_encode(df, merges).collect()
        }
        assert int(rows[1]["n_words"]) == 7
        # lossless: concatenated symbols == concatenated words + markers
        joined = "".join(rows[2]["bpe_tokens"])
        assert joined == ("newest" + END) * 6
        # compression: fewer symbols than characters
        assert int(rows[2]["n_bpe_tokens"]) < len("newest") * 6

    def test_word_table_cap(self, spark, monkeypatch):
        import koncorde_spark.pipeline.bpe as bpe_mod

        monkeypatch.setattr(bpe_mod, "MAX_WORD_TABLE", 2)
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": ["a b c d e"]})
        )
        with pytest.raises(ValueError, match="sampled corpus"):
            bpe_mod.bpe_train(df, 2)
