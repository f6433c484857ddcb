"""Registry invariants the driver protocol depends on: every catalog
entry carries an oracle, the driver-sampled window is exactly 50
unique names with the flagship in slot 50, and the bench's entry list
names only real entries."""


def test_every_entry_has_an_oracle():
    from search_engine_core_ray.pipelines.catalog import ORACLE_SQL, QUERIES

    missing = [k for k in QUERIES if k not in ORACLE_SQL]
    assert missing == [], f"entries without oracle SQL: {missing}"
    stale = [k for k in ORACLE_SQL if k not in QUERIES]
    assert stale == [], f"oracles without an entry: {stale}"


def test_driver_window_shape():
    from search_engine_core_ray.pipelines.catalog import QUERIES

    first50 = list(QUERIES)[:50]
    assert len(set(first50)) == 50
    assert first50[49] == "build_and_search"  # flagship sampled every round


def test_bench_names_resolve():
    import ast
    import os

    from search_engine_core_ray.pipelines.catalog import QUERIES

    bench = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    tree = ast.parse(open(bench).read())
    names = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "cat_names":
                    names = {
                        ast.literal_eval(e) for e in node.value.elts
                    }
    assert names, "cat_names list not found in bench.py"
    unknown = sorted(n for n in names if n not in QUERIES)
    assert unknown == [], f"bench names not in catalog: {unknown}"
