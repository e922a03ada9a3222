"""graphite events subsystem: store append/read, the events(*tags)
render form, and the HTTP endpoints end-to-end."""

import json
import urllib.request

import pytest

from carbon_clickhouse_spark.query.events import EventsStore, events_series


@pytest.fixture()
def store(spark, tmp_path):
    return EventsStore(spark, str(tmp_path / "events"))


def test_add_and_get(store):
    store.add("deploy api", tags=["deploy", "api"], when=1000, data="v1.2")
    store.add("deploy web", tags="deploy web", when=2000)  # string form
    store.add("incident", tags=["pager"], when=3000)

    got = store.get(0, 5000)
    assert [e["what"] for e in got] == ["deploy api", "deploy web", "incident"]
    # AND tag semantics
    assert [e["when"] for e in store.get(0, 5000, ["deploy"])] == [1000, 2000]
    assert [e["when"] for e in store.get(0, 5000, ["deploy", "api"])] == [1000]
    # inclusive window
    assert [e["when"] for e in store.get(2000, 3000)] == [2000, 3000]
    assert store.get(0, 5000, ["nope"]) == []


def test_events_series(spark, store):
    store.add("d1", tags=["deploy"], when=100)
    store.add("d2", tags=["deploy"], when=100)
    store.add("d3", tags=["deploy"], when=300)
    store.add("other", tags=["x"], when=200)
    rows = {
        r["time"]: r["value"]
        for r in events_series(store.df(), ["deploy"], 0, 1000).collect()
    }
    assert rows == {100: 2.0, 300: 1.0}
    name = events_series(store.df(), ["deploy"], 0, 1000).head()["path"]
    assert name == "events(deploy)"
    # empty store -> empty series, not an error
    empty = events_series(None, ["deploy"], 0, 1000, spark=spark)
    assert empty.count() == 0


def test_http_events_round_trip(spark, tmp_path):
    """POST /events/ -> GET /events/get_data -> render events('t')."""
    from carbon_clickhouse_spark.pipeline import IngestConfig, ingest_and_store
    from carbon_clickhouse_spark.sources.plain import parse_plain_lines
    from carbon_clickhouse_spark.__main__ import serve_api

    root = str(tmp_path / "tables")
    lines = spark.createDataFrame(
        [("m.cpu 1 1625400000",)], "line string"
    )
    ingest_and_store(
        parse_plain_lines(lines), root, IngestConfig(now=1625478400)
    )
    api = serve_api(root, spark)
    try:
        base = f"http://127.0.0.1:{api.port}"
        for when, what, tags in (
            (1625400100, "deploy v1", ["deploy"]),
            (1625400100, "deploy v1 canary", ["deploy"]),
            (1625400200, "scale up", ["autoscale"]),
        ):
            req = urllib.request.Request(
                f"{base}/events/",
                data=json.dumps(
                    {"what": what, "tags": tags, "when": when}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            added = json.loads(urllib.request.urlopen(req, timeout=60).read())
            assert added["what"] == what and added["when"] == when

        got = json.loads(
            urllib.request.urlopen(
                f"{base}/events/get_data?from=1625400000&until=1625401000"
                "&tags=deploy",
                timeout=60,
            ).read()
        )
        assert [e["what"] for e in got] == ["deploy v1", "deploy v1 canary"]

        # graphite's /events accepts the same at-style from/until
        # forms as /render (r12): a relative window anchored at 'now'
        # reaches back past every event above
        rel = json.loads(
            urllib.request.urlopen(
                f"{base}/events/get_data?from=-10years&until=now"
                "&tags=deploy",
                timeout=60,
            ).read()
        )
        assert [e["what"] for e in rel] == [
            "deploy v1", "deploy v1 canary"
        ]

        body = json.loads(
            urllib.request.urlopen(
                f"{base}/render?target=events('deploy')"
                "&from=1625400000&until=1625401000&format=json",
                timeout=120,
            ).read()
        )
        assert body and body[0]["target"] == "events(deploy)"
        vals = {t: v for v, t in body[0]["datapoints"]}
        assert vals[1625400100] == 2.0

        # malformed POST -> 400, not a wedged server
        bad = urllib.request.Request(
            f"{base}/events/", data=b'{"tags": ["no-what"]}',
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=60)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        api.stop()
