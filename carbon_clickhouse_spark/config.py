"""Load a reference-format ``carbon-clickhouse.conf`` (TOML) into this
engine's config objects — a user switching from go-graphite's
carbon-clickhouse keeps their config file as-is.

Section mapping (reference ``carbon/config.go:100-199``,
``uploader/config.go:16-34``, ``helper/tags/graphite.go:192-198``):

- ``[data]`` -> landing/chunk settings (:class:`EngineConfig`:
  ``data_path``, ``chunk_interval_s``, ``chunk_auto_interval``,
  ``compression``)
- ``[tcp]/[udp]/[pickle]/[grpc]/[prometheus]/[telegraf_http_json]``
  -> per-receiver drop rules (F1-F3); :meth:`EngineConfig.ingest`
  builds the :class:`~.pipeline.IngestConfig` for a given receiver
- ``[upload.*]`` -> :class:`UploadConfig` per table (type, table
  name, url, zero-timestamp, ignored-patterns, tls, ...); the
  points-type entry's ``ignored-patterns``, the tagged entry's
  ``ignored-tagged-metrics`` and the index entry's
  ``disable-daily-index`` fold into the IngestConfig
- ``[convert_to_tagged]`` -> :class:`~.functions.tags.TagConfig`

Durations are Go ``time.ParseDuration`` strings ("1m30s", "2h", "0s").
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .functions.tags import TagConfig
from .pipeline import IngestConfig
from .sinks.clickhouse import TLSConfig

_DUR_RE = re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)")
_DUR_UNITS = {
    "ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3, "s": 1.0,
    "m": 60.0, "h": 3600.0,
}


def parse_go_duration(s: str | None) -> float:
    """Go ``time.ParseDuration`` subset: "1m30s" -> 90.0 (seconds).
    Empty / "0" / None -> 0."""
    if not s or s == "0":
        return 0.0
    total, matched = 0.0, 0
    for m in _DUR_RE.finditer(s):
        total += float(m.group(1)) * _DUR_UNITS[m.group(2)]
        matched += m.end() - m.start()
    if matched != len(s.replace("+", "").replace("-", "")):
        raise ValueError(f"bad duration {s!r}")
    return -total if s.startswith("-") else total


@dataclass
class UploadConfig:
    """One ``[upload.<name>]`` entry (uploader/config.go:16-34)."""

    name: str
    type: str = "points"
    table: str = ""
    url: str = ""
    timeout_s: float = 60.0
    cache_ttl_s: float = 0.0
    threads: int = 1
    zero_timestamp: bool = False
    compress_data: bool = False
    tree_date: str = ""  # type=tree
    hash: str = ""
    ignored_patterns: list[str] = field(default_factory=list)
    ignored_tagged_metrics: list[str] = field(default_factory=list)
    disable_daily_index: bool = False
    tls: TLSConfig | None = None


@dataclass
class ReceiverConfig:
    """Shared per-receiver options (tcp/udp/pickle/grpc/prometheus/
    telegraf sections)."""

    name: str
    enabled: bool = False
    listen: str = ""
    drop_future_s: float = 0.0
    drop_past_s: float = 0.0
    drop_longer_than: int = 0
    concat: str = "_"  # telegraf only
    log_incomplete: bool = False  # udp only (carbon/config.go:37)
    read_timeout_s: float = 0.0  # tcp only (carbon/config.go:49)


@dataclass
class EngineConfig:
    data_path: str = "/data/carbon-clickhouse/"
    chunk_interval_s: float = 1.0
    chunk_auto_interval: str = ""
    chunk_max_size: int = 0
    compression: str = "none"  # none | lz4 (helper/config/compression.go)
    compression_level: int = 0
    metric_prefix: str = "carbon.agents.{host}"
    metric_interval_s: float = 60.0
    metric_endpoint: str = ""  # "" = local (self-metrics into tables)
    max_cpu: int = 0  # 0 = engine default ($SPARK_GRAFT_CPUS)
    utc_date: bool = True
    pprof_enabled: bool = False
    receivers: dict[str, ReceiverConfig] = field(default_factory=dict)
    uploads: dict[str, UploadConfig] = field(default_factory=dict)
    tag_config: TagConfig | None = None

    def divergences(self) -> list[str]:
        """Reference options this config sets that the engine
        acknowledges but intentionally handles differently — printed
        at --config startup so an operator migrating a file is told,
        not silently ignored (carbon/config.go fields)."""
        out = []
        if not self.utc_date:
            out.append(
                "data.utc-date=false: engine dates are always UTC "
                "(deterministic cross-engine comparison); local-TZ "
                "daily indexes are not supported"
            )
        if self.metric_endpoint and not self.metric_endpoint.startswith(
            ("tcp://", "udp://")
        ):
            if self.metric_endpoint != "local":
                out.append(
                    f"common.metric-endpoint={self.metric_endpoint!r}: "
                    "not tcp:// or udp:// — self-metrics stay local "
                    "(the reference's parse-error fallback)"
                )
        if self.pprof_enabled:
            out.append(
                "pprof.enabled: use the Spark UI / JFR instead of Go "
                "pprof"
            )
        for name, u in self.uploads.items():
            if u.hash:
                out.append(
                    f"upload.{name}.hash={u.hash!r}: exists-cache keys "
                    "hash with xxhash64 here (same memory effect as "
                    "city64, different function; the /debug cache dump "
                    "shows full paths either way)"
                )
            if u.tls is None:
                continue
            if u.tls.client_auth:
                out.append(
                    f"upload.{name}.tls.client-auth: accepted but "
                    "inert on the client hop — the reference's own "
                    "ParseClientTLSConfig never reads it either"
                )
            if len(u.tls.curves) > 1:
                out.append(
                    f"upload.{name}.tls.curves: only the first curve "
                    f"({u.tls.curves[0]}) is pinned — CPython ssl "
                    "exposes one tmp-ECDH group, not a preference list"
                )
        return out

    def upload_of_type(self, type_: str) -> UploadConfig | None:
        for u in self.uploads.values():
            if u.type == type_:
                return u
        return None

    def ingest(self, receiver: str = "tcp", now: int | None = None) -> IngestConfig:
        """IngestConfig for one receiver's drop rules plus the
        table-level filter options from the upload entries."""
        r = self.receivers.get(receiver) or ReceiverConfig(receiver)
        points = self.upload_of_type("points")
        tagged = self.upload_of_type("tagged")
        index = self.upload_of_type("index")
        legacy = tuple(
            t for t in ("tree", "series", "series-reverse")
            if self.upload_of_type(t) is not None
        )
        tree = self.upload_of_type("tree")
        return IngestConfig(
            legacy_tables=legacy,
            tree_date=(tree.tree_date or None) if tree else None,
            drop_future_seconds=int(r.drop_future_s) or None,
            drop_past_seconds=int(r.drop_past_s) or None,
            drop_longer_than=r.drop_longer_than or None,
            ignored_patterns=list(points.ignored_patterns) if points else [],
            ignored_tagged_metrics=(
                list(tagged.ignored_tagged_metrics) if tagged else []
            ),
            disable_daily_index=bool(index and index.disable_daily_index),
            now=now,
        )

    def clickhouse_target(self):
        """CHTarget assembled from the ``[upload.*]`` entries — the
        exact endpoints a reference config names (URL/table/compress/
        zero-timestamp/TLS per ``uploader/config.go:16-34``). None if
        no upload entry carries a URL. Per-type table names map onto
        the streaming fan-out's points/points_reverse/index/tagged
        keys; the points entry's transport options win (the reference
        allows per-uploader URLs, the Spark sink posts every table to
        one endpoint — same database in practice)."""
        from .sinks.clickhouse import CHTarget

        points = self.upload_of_type("points")
        anchor = points or next(
            (u for u in self.uploads.values() if u.url), None
        )
        if anchor is None or not anchor.url:
            return None
        names = {}
        for key, type_ in (
            ("points", "points"),
            ("points_reverse", "points-reverse"),
            ("index", "index"),
            ("tagged", "tagged"),
        ):
            u = self.upload_of_type(type_)
            if u is not None and u.table:
                names[key] = u.table
        return CHTarget(
            base_url=anchor.url.rstrip("/"),
            gzip=anchor.compress_data,
            tls=anchor.tls,
            zero_timestamp=anchor.zero_timestamp,
            tables=names or None,
        )

    def stream(
        self,
        root: str | None = None,
        receiver: str = "tcp",
        upload: bool = False,
        **kwargs,
    ):
        """StreamConfig wired from [data] + one receiver's drop rules
        (override the landing root for testing). ``upload=True``
        additionally mirrors every micro-batch into the ClickHouse
        named by the config's ``[upload.*]`` URLs (opt-in: a config
        whose CH isn't actually reachable must not wedge ingest by
        default)."""
        from .streaming.ingest import StreamConfig

        ms = max(int(self.chunk_interval_s * 1000), 1)
        return StreamConfig(
            root=root or self.data_path,
            chunk_interval=f"{ms} milliseconds",
            ingest=self.ingest(receiver),
            tag_config=self.tag_config,
            clickhouse=self.clickhouse_target() if upload else None,
            # label the pipeline with ITS protocol: the dropped-audit
            # rows, /debug/receive/<protocol>/dropped slicing, S7
            # stat-module attribution, and the unique ccs-<protocol>
            # query name all key on it
            protocol=receiver,
            **kwargs,
        )


def parse_size(v) -> int:
    """Reference Size option (helper/config/size.go): plain int or a
    string with a k/m/g suffix (1024 multiples), negatives rejected."""
    if isinstance(v, int):
        n = v
    else:
        t = str(v).strip().lower()
        mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}.get(t[-1:] or "", 1)
        n = int(t[:-1] if mult > 1 else t) * mult
    if n < 0:
        raise ValueError("size must be greater than 0")
    return n


def _known_hash(value: str, upload_name: str) -> str:
    """uploader/hash.go: the hash option has exactly two values."""
    if value not in ("", "city64"):
        raise ValueError(
            f"upload.{upload_name}.hash={value!r}: unknown hash "
            "function (known: city64)"
        )
    return value


def _tls_from(section: dict) -> TLSConfig:
    return TLSConfig(
        ca_certs=list(section.get("ca-cert", [])),
        certificates=[
            (c["cert"], c["key"]) for c in section.get("certificates", [])
        ],
        server_name=section.get("server-name") or None,
        insecure_skip_verify=bool(section.get("insecure-skip-verify", False)),
        min_version=section.get("min-version") or None,
        max_version=section.get("max-version") or None,
        cipher_suites=list(section.get("cipher-suites", [])),
        curves=list(section.get("curves", [])),
        client_auth=section.get("client-auth") or None,
    )


_RECEIVER_SECTIONS = (
    "tcp", "udp", "pickle", "grpc", "prometheus", "telegraf_http_json",
    "otlp",  # beyond the reference: OpenTelemetry metrics over HTTP
)

#: recognized keys per section, for --exact-config (the reference's
#: strict mode: every config param must exist in the target struct)
_KNOWN_KEYS = {
    "common": {"metric-prefix", "metric-interval", "metric-endpoint",
               "max-cpu", "enabled"},
    "data": {"path", "chunk-interval", "chunk-auto-interval",
             "chunk-max-size", "compression", "compression-level",
             "utc-date"},
    "pprof": {"listen", "enabled"},
    "logging": None,  # zap config list: accepted wholesale
    "convert_to_tagged": {"enabled", "separator", "tags", "templates"},
    "__receiver__": {"listen", "enabled", "drop-future", "drop-past",
                     "drop-longer-than", "concat", "log-incomplete",
                     "read-timeout"},
    "__upload__": {"type", "table", "url", "timeout", "cache-ttl",
                   "threads", "zero-timestamp", "compress-data", "date",
                   "hash", "ignored-patterns", "ignored-tagged-metrics",
                   "disable-daily-index", "tls"},
    "__tls__": {"ca-cert", "certificates", "server-name",
                "insecure-skip-verify", "min-version", "max-version",
                "cipher-suites", "client-auth", "curves"},
}


def unknown_keys(raw: dict) -> list[str]:
    """Dotted paths of config entries the engine does not recognize —
    the reference's ``--exact-config`` strictness."""
    bad: list[str] = []
    for section, body in raw.items():
        if section in _RECEIVER_SECTIONS:
            known = _KNOWN_KEYS["__receiver__"]
        elif section == "upload":
            for name, sec in body.items():
                for k in sec:
                    if k not in _KNOWN_KEYS["__upload__"]:
                        bad.append(f"upload.{name}.{k}")
                for k in sec.get("tls", {}):
                    if k not in _KNOWN_KEYS["__tls__"]:
                        bad.append(f"upload.{name}.tls.{k}")
            continue
        elif section in _KNOWN_KEYS:
            known = _KNOWN_KEYS[section]
        else:
            bad.append(section)
            continue
        if known is None:
            continue
        for k in body:
            if k not in known:
                bad.append(f"{section}.{k}")
    return bad


#: the reference's shipped defaults (README "Configuration"), in the
#: engine's accepted vocabulary — what --config-print-default emits
DEFAULT_CONFIG = """\
[common]
metric-prefix = "carbon.agents.{host}"
metric-endpoint = "local"
metric-interval = "1m0s"
max-cpu = 0

[data]
path = "/data/carbon-clickhouse/"
chunk-interval = "1s"
chunk-auto-interval = ""
compression = "none"
compression-level = 0

[upload.graphite]
type = "points"
table = "graphite"
url = "http://localhost:8123/"
timeout = "1m0s"
zero-timestamp = false

[upload.graphite_index]
type = "index"
table = "graphite_index"
url = "http://localhost:8123/"
cache-ttl = "12h0m0s"

[tcp]
listen = ":2003"
enabled = true
drop-future = "0s"
drop-past = "0s"

[udp]
listen = ":2003"
enabled = true

[pickle]
listen = ":2004"
enabled = true

[grpc]
listen = ":2005"
enabled = false

[prometheus]
listen = ":2006"
enabled = false

[telegraf_http_json]
listen = ":2007"
enabled = false

[pprof]
listen = "localhost:7007"
enabled = false
"""


def load_config(source: str, exact: bool = False) -> EngineConfig:
    """Parse a carbon-clickhouse TOML config (path or literal text).
    ``exact`` mirrors the reference's ``--exact-config``: unknown
    keys raise instead of being ignored."""
    import os
    import tomllib

    if os.path.exists(source):
        with open(source, "rb") as fh:
            raw = tomllib.load(fh)
    else:
        raw = tomllib.loads(source)

    if exact:
        bad = unknown_keys(raw)
        if bad:
            raise ValueError(
                "unknown config keys: " + ", ".join(sorted(bad))
            )

    cfg = EngineConfig()

    common = raw.get("common", {})
    cfg.metric_prefix = common.get("metric-prefix", cfg.metric_prefix)
    if "metric-interval" in common:
        cfg.metric_interval_s = parse_go_duration(common["metric-interval"])
    cfg.metric_endpoint = common.get("metric-endpoint", "")
    cfg.max_cpu = int(common.get("max-cpu", 0))
    cfg.pprof_enabled = bool(raw.get("pprof", {}).get("enabled", False))

    data = raw.get("data", {})
    cfg.data_path = data.get("path", cfg.data_path)
    if "chunk-interval" in data:
        cfg.chunk_interval_s = parse_go_duration(data["chunk-interval"]) or 1.0
    cfg.chunk_auto_interval = data.get("chunk-auto-interval", "")
    cfg.chunk_max_size = parse_size(data.get("chunk-max-size", 0))
    cfg.compression = str(data.get("compression", "none")) or "none"
    cfg.compression_level = int(data.get("compression-level", 0))
    # reference default is false (local-TZ dates); the engine is
    # always-UTC — divergences() surfaces an explicit false
    cfg.utc_date = bool(data.get("utc-date", True))

    for name in _RECEIVER_SECTIONS:
        sec = raw.get(name)
        if sec is None:
            continue
        cfg.receivers[name] = ReceiverConfig(
            name=name,
            enabled=bool(sec.get("enabled", False)),
            listen=sec.get("listen", ""),
            drop_future_s=parse_go_duration(sec.get("drop-future")),
            drop_past_s=parse_go_duration(sec.get("drop-past")),
            drop_longer_than=int(sec.get("drop-longer-than", 0)),
            concat=sec.get("concat", "_"),
            log_incomplete=bool(sec.get("log-incomplete", False)),
            read_timeout_s=parse_go_duration(sec.get("read-timeout")),
        )

    for name, sec in raw.get("upload", {}).items():
        cfg.uploads[name] = UploadConfig(
            name=name,
            type=sec.get("type", "points"),
            table=sec.get("table", name) or name,
            url=sec.get("url", ""),
            timeout_s=parse_go_duration(sec.get("timeout")) or 60.0,
            cache_ttl_s=parse_go_duration(sec.get("cache-ttl")),
            threads=int(sec.get("threads", 1)),
            zero_timestamp=bool(sec.get("zero-timestamp", False)),
            compress_data=bool(sec.get("compress-data", False)),
            tree_date=sec.get("date", ""),
            # uploader/hash.go knownHash: only "" and "city64" exist;
            # anything else is a config error in the reference too
            hash=_known_hash(sec.get("hash", ""), name),
            ignored_patterns=list(sec.get("ignored-patterns", [])),
            ignored_tagged_metrics=list(sec.get("ignored-tagged-metrics", [])),
            disable_daily_index=bool(sec.get("disable-daily-index", False)),
            tls=_tls_from(sec["tls"]) if "tls" in sec else None,
        )

    tagged = raw.get("convert_to_tagged")
    if tagged is not None:
        cfg.tag_config = TagConfig(
            enabled=bool(tagged.get("enabled", False)),
            separator=tagged.get("separator", "_"),
            tags=list(tagged.get("tags", [])),
            templates=list(tagged.get("templates", [])),
        ).configure()

    return cfg


#: DDL templates per uploader type — the README's table contract
#: (reference README.md "ClickHouse configuration", column shapes are
#: fixed by the RowBinary wire format the uploaders send)
_DDL = {
    "points": (
        "CREATE TABLE IF NOT EXISTS {table} (\n"
        "  Path String,\n  Value Float64,\n  Time UInt32,\n"
        "  Date Date,\n  Timestamp UInt32\n"
        ") ENGINE = GraphiteMergeTree('{rollup}')\n"
        "PARTITION BY toYYYYMM(Date)\nORDER BY (Path, Time);"
    ),
    "index": (
        "CREATE TABLE IF NOT EXISTS {table} (\n"
        "  Date Date,\n  Level UInt32,\n  Path String,\n"
        "  Version UInt32\n"
        ") ENGINE = ReplacingMergeTree(Version)\n"
        "PARTITION BY toYYYYMM(Date)\nORDER BY (Level, Path, Date);"
    ),
    "tagged": (
        "CREATE TABLE IF NOT EXISTS {table} (\n"
        "  Date Date,\n  Tag1 String,\n  Path String,\n"
        "  Tags Array(String),\n  Version UInt32\n"
        ") ENGINE = ReplacingMergeTree(Version)\n"
        "PARTITION BY toYYYYMM(Date)\nORDER BY (Tag1, Path, Date);"
    ),
    # legacy uploader types (uploader/uploader.go:48-60): the
    # graphite-web 0.9 tree/series tables
    "tree": (
        "CREATE TABLE IF NOT EXISTS {table} (\n"
        "  Date Date,\n  Level UInt32,\n  Path String,\n"
        "  Version UInt32\n"
        ") ENGINE = ReplacingMergeTree(Version)\n"
        "PARTITION BY toYYYYMM(Date)\nORDER BY (Level, Path, Date);"
    ),
    "series": (
        "CREATE TABLE IF NOT EXISTS {table} (\n"
        "  Date Date,\n  Level UInt32,\n  Path String,\n"
        "  Version UInt32\n"
        ") ENGINE = ReplacingMergeTree(Version)\n"
        "PARTITION BY toYYYYMM(Date)\nORDER BY (Level, Path, Date);"
    ),
}
_DDL["points-reverse"] = _DDL["points"]
_DDL["series-reverse"] = _DDL["series"]


def clickhouse_ddl(cfg, rollup_section: str = "graphite_rollup") -> str:
    """CREATE TABLE statements for every ``[upload.*]`` entry of
    ``cfg`` — the DDL the reference README tells operators to run by
    hand, generated from the config instead (table names and types
    from the deployment's own uploaders; points tables bind the
    ``rollup_section`` GraphiteMergeTree config)."""
    out = []
    for name, u in sorted(cfg.uploads.items()):
        tpl = _DDL.get(u.type)
        if tpl is None:
            continue  # e.g. a custom/unknown uploader type
        table = u.table or name
        out.append(f"-- [upload.{name}] type={u.type}")
        out.append(tpl.format(table=table, rollup=rollup_section))
    return "\n".join(out) + ("\n" if out else "")
