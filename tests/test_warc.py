"""WARC writer/reader: spec framing, adversarial payloads, distributed
round-trip."""

import pytest


class TestWarcFraming:
    def test_record_roundtrip_with_adversarial_payload(self):
        from orange3_timeseries_spark.sources.warc import (
            _record,
            parse_warc_bytes,
        )
        # payload containing the record terminator and a fake header —
        # Content-Length framing must carry it through intact
        evil = b"WARC/1.0\r\n\r\nContent-Length: 0\r\n\r\nrest"
        blob = (_record("u://a", "2024-01-01T00:00:00Z", "text/plain",
                        evil)
                + _record("u://b", "2024-01-02T00:00:00Z", "text/plain",
                          b""))
        recs = list(parse_warc_bytes(blob))
        assert [r[0] for r in recs] == ["u://a", "u://b"]
        assert recs[0][3] == evil
        assert recs[1][3] == b""

    def test_record_id_mandatory_field(self):
        """Every record carries a WARC-Record-ID (mandatory per ISO
        28500 §5.2) as a ``<urn:uuid:...>``, deterministic in
        (URI, date) so retried writes produce identical bytes."""
        import re

        from orange3_timeseries_spark.sources.warc import _record

        a1 = _record("u://a", "2024-01-01T00:00:00Z", "t", b"x")
        a2 = _record("u://a", "2024-01-01T00:00:00Z", "t", b"x")
        b1 = _record("u://b", "2024-01-01T00:00:00Z", "t", b"x")
        pat = rb"WARC-Record-ID: <urn:uuid:[0-9a-f-]{36}>\r\n"
        assert re.search(pat, a1)
        assert a1 == a2  # deterministic
        rid = lambda blob: re.search(pat, blob).group(0)  # noqa: E731
        assert rid(a1) != rid(b1)  # unique per record
        # same (URI, date) but different payload → distinct IDs (a
        # retried capture with a changed body is a different record)
        a3 = _record("u://a", "2024-01-01T00:00:00Z", "t", b"y")
        assert rid(a3) != rid(a1)
        # byte-identical record re-emitted at a different position →
        # distinct IDs (same page captured twice in one second)
        a4 = _record("u://a", "2024-01-01T00:00:00Z", "t", b"x", seq=1)
        assert rid(a4) != rid(a1)

    def test_errors(self):
        from orange3_timeseries_spark.sources.warc import (
            _record,
            parse_warc_bytes,
        )
        with pytest.raises(ValueError, match="bad version"):
            list(parse_warc_bytes(b"HTTP/1.1 200\r\n\r\n"))
        good = _record("u://a", "d", "t", b"xyz")
        with pytest.raises(ValueError, match="truncated"):
            list(parse_warc_bytes(good[:-6]))  # cut into the payload
        noclen = good.replace(b"Content-Length: 3\r\n", b"")
        with pytest.raises(ValueError, match="Content-Length"):
            list(parse_warc_bytes(noclen))


class TestWarcSpark:
    def test_distributed_roundtrip(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from orange3_timeseries_spark.sources.warc import (
            read_warc,
            write_warc,
        )
        rows = [(i, f"doc {i} body with\r\nnewlines and ünïcode")
                for i in range(97)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        path = str(tmp_path / "w")
        n_files = write_warc(
            df.select(F.concat(F.lit("corpus://x/"),
                               F.col("doc_id")).alias("url"), "text")
              .repartition(5),
            path, "url", "text")
        assert 1 <= n_files <= 5
        back = read_warc(spark, path)
        got = {int(r.url.rsplit("/", 1)[1]): r.content
               for r in back.collect()}
        assert got == {i: t for i, t in rows}
        [ct] = back.select("content_type").distinct().collect()
        assert ct.content_type == "text/plain"
