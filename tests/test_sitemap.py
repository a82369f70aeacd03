"""Sitemap ingestion (raydoc/sources/sitemap.py)."""

import gzip

import pyarrow as pa

from raydoc.sources.sitemap import parse_sitemap_bytes, read_sitemaps

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.com/page1</loc>
       <lastmod>2024-02-01T10:00:00Z</lastmod></url>
  <url><loc><![CDATA[https://a.com/page2?x=1&amp;y=2]]></loc>
       <lastmod>bogus-date</lastmod></url>
  <url><loc>  https://a.com/page3  </loc></url>
  <url><priority>0.5</priority></url>
</urlset>"""

INDEX = b"""<sitemapindex>
  <sitemap><loc>https://a.com/sitemap-a.xml</loc></sitemap>
  <sitemap><loc>https://a.com/sitemap-b.xml.gz</loc></sitemap>
</sitemapindex>"""


class TestParse:
    def test_urlset(self):
        t, children = parse_sitemap_bytes(URLSET)
        assert t.column("url").to_pylist() == [
            "https://a.com/page1",
            "https://a.com/page2?x=1&amp;y=2",
            "https://a.com/page3"]
        mods = t.column("lastmod").to_pylist()
        assert mods[0].month == 2 and mods[1] is None and mods[2] is None
        assert children == []

    def test_sitemapindex(self):
        t, children = parse_sitemap_bytes(INDEX)
        assert t.num_rows == 0
        assert children == ["https://a.com/sitemap-a.xml",
                            "https://a.com/sitemap-b.xml.gz"]

    def test_gzip_magic_and_garbage(self):
        t, _ = parse_sitemap_bytes(gzip.compress(URLSET))
        assert t.num_rows == 3
        t2, c2 = parse_sitemap_bytes(b"not xml at all \xff")
        assert t2.num_rows == 0 and c2 == []


class TestRead:
    def test_read_and_compose_with_schedule(self, ray_session, tmp_path):
        from raydoc.ops.url import host_of_url

        p1 = tmp_path / "s1.xml"
        p1.write_bytes(URLSET)
        p2 = tmp_path / "s2.xml.gz"
        p2.write_bytes(gzip.compress(
            b"<urlset><url><loc>https://b.org/z</loc></url></urlset>"))
        ds = read_sitemaps([str(p1), str(p2)])
        rows = ds.take_all()
        assert len(rows) == 4
        # discovery feeds the politeness chain: hosts parse cleanly
        hosts = host_of_url(pa.array([r["url"] for r in rows]))
        assert set(hosts.to_pylist()) == {"a.com", "b.org"}
