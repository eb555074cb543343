"""RSS 2.0 / Atom 1.0 feed parser — the OTHER standard seed source a
production crawler ingests alongside sitemaps (news/blog discovery,
freshness signals via pubDate).

Same hardening discipline as ``sitemap.py``: stdlib ElementTree with
a pre-parse DTD/ENTITY rejection (untrusted crawl input must not
trigger entity-expansion blowups), a size cap, gzip payloads, and
``ValueError`` on malformed XML for the per-row error capture
upstream.  Returns a uniform entry shape for both formats:

* **RSS 2.0** (``<rss><channel><item>``): link, title, pubDate, guid.
* **Atom 1.0** (``<feed><entry>``): the ``rel="alternate"`` (or
  first) ``<link href>``, title, updated/published, id.
"""

from __future__ import annotations

import gzip
import io
import xml.etree.ElementTree as ET

_MAX_BYTES = 64 << 20


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _text(el) -> str | None:
    t = "".join(el.itertext()).strip()
    return t or None


def parse_feed(data: bytes):
    """Feed bytes (plain or gzip) → ``("rss" | "atom",
    [ {link, title, published, id} ... ])``."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.GzipFile(fileobj=io.BytesIO(data)).read(_MAX_BYTES + 1)
        except (OSError, EOFError) as e:
            raise ValueError(f"corrupt gzip feed: {e}") from None
    if len(data) > _MAX_BYTES:
        raise ValueError("feed exceeds the size cap")
    head = data[:4096]
    if b"<!DOCTYPE" in head or b"<!ENTITY" in head:
        raise ValueError("DTD in feed rejected (untrusted input)")
    try:
        root = ET.fromstring(data)
    except ET.ParseError as e:
        raise ValueError(f"malformed feed XML: {e}") from None

    kind = _local(root.tag)
    if kind == "rss":
        channel = next(
            (c for c in root if _local(c.tag) == "channel"), None
        )
        if channel is None:
            raise ValueError("rss feed without a channel")
        out = []
        for item in channel:
            if _local(item.tag) != "item":
                continue
            fields = {_local(c.tag): c for c in item}
            link = fields.get("link")
            out.append(
                {
                    "link": _text(link) if link is not None else None,
                    "title": _text(fields["title"])
                    if "title" in fields else None,
                    "published": _text(fields["pubdate"])
                    if "pubdate" in fields else None,
                    "id": _text(fields["guid"])
                    if "guid" in fields else None,
                }
            )
        return "rss", out
    if kind == "feed":
        out = []
        for entry in root:
            if _local(entry.tag) != "entry":
                continue
            link = None
            for c in entry:
                if _local(c.tag) == "link":
                    rel = c.get("rel", "alternate")
                    if rel == "alternate" or link is None:
                        link = c.get("href")
                        if rel == "alternate":
                            break
            fields = {_local(c.tag): c for c in entry}
            published = None
            for key in ("updated", "published"):
                if key in fields:
                    published = _text(fields[key])
                    break
            out.append(
                {
                    "link": link,
                    "title": _text(fields["title"])
                    if "title" in fields else None,
                    "published": published,
                    "id": _text(fields["id"]) if "id" in fields else None,
                }
            )
        return "atom", out
    raise ValueError(f"not an RSS or Atom feed (root <{kind}>)")


def build_rss(items, *, gzip_payload: bool = False) -> bytes:
    """Serialize ``[{link, title, published, id}]`` as RSS 2.0 —
    the writer half the parser tests against."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<rss version="2.0"><channel><title>t</title>']
    for it in items:
        parts.append("<item>")
        if it.get("link"):
            parts.append(f"<link>{it['link']}</link>")
        if it.get("title"):
            parts.append(f"<title>{it['title']}</title>")
        if it.get("published"):
            parts.append(f"<pubDate>{it['published']}</pubDate>")
        if it.get("id"):
            parts.append(f"<guid>{it['id']}</guid>")
        parts.append("</item>")
    parts.append("</channel></rss>")
    raw = "".join(parts).encode()
    return gzip.compress(raw) if gzip_payload else raw


def build_atom(items, *, gzip_payload: bool = False) -> bytes:
    """Serialize the same shape as Atom 1.0."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<feed xmlns="http://www.w3.org/2005/Atom"><title>t</title>']
    for it in items:
        parts.append("<entry>")
        if it.get("link"):
            parts.append(f'<link rel="alternate" href="{it["link"]}"/>')
        if it.get("title"):
            parts.append(f"<title>{it['title']}</title>")
        if it.get("published"):
            parts.append(f"<updated>{it['published']}</updated>")
        if it.get("id"):
            parts.append(f"<id>{it['id']}</id>")
        parts.append("</entry>")
    parts.append("</feed>")
    raw = "".join(parts).encode()
    return gzip.compress(raw) if gzip_payload else raw
