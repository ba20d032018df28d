"""End-to-end tests on the reference's flagship nested shapes
(FIXTURES.md F5-F7/F11): document-JSON objects keyed by IDs whose
values are similar records — the record-vs-table duality plus the
merge fixpoint, through the same path the CLI takes."""

import json

from structa_spark.ui.cli import get_config, get_structure


def test_usn_shape_collapses_to_table(spark, tmp_path):
    # one JSON document: object keyed by "dddd-d" ids -> similar records
    # (the Ubuntu USN shape, reference README.rst:108-152)
    # variable-length cves lists, like the real USN data — a constant
    # length would (correctly, reference analyzer.py:582-587) induce a
    # positional tuple instead of a list
    doc = {
        f"{2000 + i:04d}-1": {
            "title": f"USN advisory {i}",
            "cves": [f"CVE-2020-{1000 + i + j}"
                     for j in range(1 + (i % 3))],
            "timestamp": 1577836800.0 + i * 86400,
        }
        for i in range(40)     # > field_threshold=20
    }
    f = tmp_path / "usn.json"
    f.write_text(json.dumps(doc))
    out = get_structure(get_config([str(f)]), spark=spark)
    # outer object becomes a table keyed by the id pattern, values are
    # the merged record; the float timestamps decode via the epoch rule
    assert out.startswith("{ str")
    assert 'pattern="20dd-1"' in out     # constant '20' chars stay literal
    assert "'title': str" in out
    assert "'cves': [ str" in out
    assert "'timestamp': float of datetime" in out


def test_air_quality_shape(spark, tmp_path):
    # {location: {euid, lat, long, readings: {iso-ts: float}}}
    doc = {
        f"site-{i:02d}": {
            "euid": f"GB{1000 + i}A",
            "lat": 50.0 + i / 10,
            "long": -3.0 + i / 10,
            "readings": {
                f"2021-06-{d + 1:02d} 00:00:00": float(d * i % 17)
                for d in range(30)     # > field_threshold
            },
        }
        for i in range(30)             # > field_threshold
    }
    f = tmp_path / "air.json"
    f.write_text(json.dumps(doc))
    out = get_structure(get_config([str(f)]), spark=spark)
    assert out.startswith("{ str")
    assert "'euid': str" in out
    assert "'lat': float" in out
    # the readings map keys are ISO timestamps -> str of datetime
    assert "'readings': { str of datetime" in out
    assert "%Y-%m-%d %H:%M:%S" in out


def test_astros_shape(spark, tmp_path):
    # README.rst:24-40: {message, number, people: [{craft, name}]}
    doc = {
        "message": "success",
        "number": 6,
        "people": [
            {"craft": "ISS", "name": f"astronaut {i}"} for i in range(6)
        ],
    }
    f = tmp_path / "astros.json"
    f.write_text(json.dumps(doc))
    out = get_structure(get_config([str(f)]), spark=spark)
    assert "'message': str" in out
    assert "'number': int" in out
    assert "'people': [ { 'craft': str" in out


def test_pypi_multi_file_merge(spark, tmp_path):
    # FIXTURES.md F11: N package JSONs analyzed as one source —
    # hex-hash patterns, version-keyed tables, URLs, ISO timestamps
    for p in range(5):
        doc = {
            "info": {
                "name": f"package-{p}",
                "home_page": f"https://example.org/p{p}",
            },
            "releases": {
                f"1.{minor}.0": [{
                    "md5_digest": f"{(p * 37 + minor) % 16:032x}",
                    "upload_time": f"2022-0{(minor % 8) + 1}-01T10:00:00",
                    "size": 1000 * (p + minor + 1),
                } for _ in range(1)]
                for minor in range(25)     # > field_threshold
            },
        }
        (tmp_path / f"pkg{p}.json").write_text(json.dumps(doc))
    files = [str(tmp_path / f"pkg{p}.json") for p in range(5)]
    out = get_structure(get_config(files), spark=spark)
    assert "'name': str" in out
    assert "'home_page': URL" in out
    # releases collapse to a table keyed by the version pattern
    assert "'releases': { str" in out
    assert "'md5_digest': str" in out
    assert "'upload_time': str of datetime" in out
    assert "'size': int" in out


def test_fuzz_random_nested_documents(spark, tmp_path):
    """Seeded fuzz: random nested JSON shapes (mixed scalars,
    optional fields, lists of records, numeric strings, nulls,
    heterogeneous values) must always profile without error, report
    the right cardinality, and render. Three seeds keep it cheap and
    deterministic."""
    import json
    import random

    from structa_spark.ui.cli import get_config, get_structure

    def rand_value(rng, depth):
        kinds = ["int", "float", "str", "bool", "numstr", "null"]
        if depth < 2:
            kinds += ["record", "list"]
        k = rng.choice(kinds)
        if k == "int":
            return rng.randint(-10**6, 10**6)
        if k == "float":
            return round(rng.uniform(-1e3, 1e3), 4)
        if k == "str":
            return "".join(rng.choice("abcdef ghij")
                           for _ in range(rng.randint(0, 12)))
        if k == "bool":
            return rng.random() < 0.5
        if k == "numstr":
            return str(rng.randint(0, 9999))
        if k == "null":
            return None
        if k == "record":
            return {f"f{j}": rand_value(rng, depth + 1)
                    for j in range(rng.randint(1, 4))}
        return [rand_value(rng, depth + 1)
                for _ in range(rng.randint(0, 4))]

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        # per-seed schema: a stable field set, some optional
        fields = [f"c{j}" for j in range(rng.randint(2, 6))]
        n = rng.randint(30, 80)
        p = tmp_path / f"fuzz_{seed}.ndjson"
        with p.open("w") as fh:
            for _ in range(n):
                row = {f: rand_value(rng, 0) for f in fields
                       if rng.random() > 0.15}
                fh.write(json.dumps(row) + "\n")
        out = get_structure(get_config([str(p)]), spark=spark)
        assert out and "{" in out, (seed, out[:100])
