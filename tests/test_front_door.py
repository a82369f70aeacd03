"""End-to-end crawl front door: discovery -> politeness -> archive ->
extraction -> curation, every stage a real engine operator."""

import pyarrow as pa


class TestFullFrontDoor:
    def test_chain(self, ray_session, tmp_path):
        import ray.data as rd

        from raydoc.ops.url import (filter_blocked_hosts,
                                    filter_robots_disallowed)
        from raydoc.ops.window import group_rank
        from raydoc.pipelines.extract_pipeline import extract_map_fn
        from raydoc.sources.sitemap import read_sitemaps
        from raydoc.sources.warc import read_warc, write_warc_bytes

        # 1. discovery: one sitemap per host
        sm = tmp_path / "sm.xml"
        sm.write_bytes(
            b"<urlset>"
            b"<url><loc>https://good.com/a</loc></url>"
            b"<url><loc>https://good.com/private/x</loc></url>"
            b"<url><loc>https://good.com/b</loc></url>"
            b"<url><loc>https://spam.net/z</loc></url>"
            b"</urlset>")
        urls = read_sitemaps([str(sm)])
        assert urls.count() == 4

        # 2. blocklist (spam.net) + 3. robots (/private/)
        allowed = filter_robots_disallowed(
            filter_blocked_hosts(urls, ["spam.net"]),
            {"good.com": "User-agent: *\nDisallow: /private/\n"},
            out_host="rhost")
        rows = sorted(r["url"] for r in allowed.take_all())
        assert rows == ["https://good.com/a", "https://good.com/b"]

        # 4. politeness schedule: slots within the host
        sched = group_rank(allowed, "host", "url", out_col="slot",
                           descending=False).take_all()
        assert sorted(r["slot"] for r in sched) == [1, 2]

        # 5. "fetch": archive the allowed urls as WARC
        warc = tmp_path / "crawl.warc"
        warc.write_bytes(write_warc_bytes([
            (r["url"], "2024-06-01T00:00:00Z",
             (f"<html><body><p>page body for {r['url']} with real "
              f"token content</p></body></html>").encode())
            for r in sched]))

        # 6. ingest -> extract -> token stats
        from raydoc.ops.text import token_count_batch

        docs = read_warc([str(warc)]).map_batches(
            extract_map_fn(token_budget=64, with_chunks=False),
            batch_format="pyarrow")
        out = docs.map_batches(
            lambda b: token_count_batch(b, "text"),
            batch_format="pyarrow").take_all()
        assert len(out) == 2
        assert all(r["status"] == "ok" and r["n_tokens"] >= 7
                   for r in out)
        assert {r["url"] for r in out} == {
            "https://good.com/a", "https://good.com/b"}
