"""search_job CLI: the --local serving-tier path runs Spark-free from a
plain subprocess and its query-string ranks match the library calls."""

import json
import os
import subprocess
import sys


def _run_local(index_dir: str, *args: str) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "jobs", "search_job.py"),
            "--index", index_dir, "--local", *args,
        ],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


class TestSearchJobLocal:
    def test_qs_mode_matches_library(self, bm25_index_dir):
        from koncorde_spark.fulltext.querystring import execute_query_string
        from koncorde_spark.fulltext.serve import LocalSearcher

        out = _run_local(
            bm25_index_dir, "--query", "+def funct* -xyzzynotaterm", "--k", "8"
        )
        want = execute_query_string(
            LocalSearcher(bm25_index_dir), "+def funct* -xyzzynotaterm", k=8
        )
        assert [(h["doc_id"], h["score"]) for h in out["hits"]] == [
            (int(d), float(s)) for d, s in want
        ]

    def test_topk_and_count_modes(self, bm25_index_dir):
        from koncorde_spark.fulltext.serve import LocalSearcher

        ls = LocalSearcher(bm25_index_dir)
        out = _run_local(
            bm25_index_dir, "--query", "def function", "--mode", "topk", "--k", "5"
        )
        assert [(h["doc_id"], h["score"]) for h in out["hits"]] == [
            (int(d), float(s)) for d, s in ls.topk("def function", 5)
        ]
        cnt = _run_local(
            bm25_index_dir, "--query", "def function", "--mode", "count"
        )
        assert cnt["count"] == ls.count("def function")

    def test_federated_multi_index(self, spark, small_corpus_pdf, tmp_path_factory):
        """Comma-separated --index dirs run the serving-tier federation
        and match LocalFederatedSearcher ranks exactly."""
        from koncorde_spark.fulltext.federate import LocalFederatedSearcher
        from koncorde_spark.fulltext.indexer import IndexConfig, build_index

        dirs = []
        for par in (0, 1):
            pdf = small_corpus_pdf[
                small_corpus_pdf.index % 2 == par
            ].reset_index(drop=True)
            out = str(tmp_path_factory.mktemp(f"cli_fed{par}"))
            build_index(spark, spark.createDataFrame(pdf).repartition(2), out,
                        IndexConfig(n_shards=2), resume=False)
            dirs.append(out)
        got = _run_local(
            ",".join(dirs), "--query", "import return", "--mode", "topk", "--k", "7"
        )
        want = LocalFederatedSearcher(dirs).topk("import return", 7)
        assert [(h["doc_id"], h["score"]) for h in got["hits"]] == [
            (int(d), float(s)) for d, s in want
        ]

    def test_alias_pointer_index(self, bm25_index_dir, tmp_path_factory):
        """alias:<root>#<name> resolves through aliases.json at open."""
        from koncorde_spark.fulltext.aliases import set_alias
        from koncorde_spark.fulltext.serve import LocalSearcher

        root = str(tmp_path_factory.mktemp("cli_alias"))
        set_alias(root, "live", bm25_index_dir)
        got = _run_local(
            f"alias:{root}#live", "--query", "def function",
            "--mode", "topk", "--k", "4",
        )
        want = LocalSearcher(bm25_index_dir).topk("def function", 4)
        assert [(h["doc_id"], h["score"]) for h in got["hits"]] == [
            (int(d), float(s)) for d, s in want
        ]
