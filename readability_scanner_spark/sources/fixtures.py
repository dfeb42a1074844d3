"""Deterministic HTML fixture synthesizer (FIXTURES.md §2 classes).

Each fixture class exercises one behavior of the extraction algorithm
(SURVEY.md §2.2). Everything is seeded — same (seed, class) → same HTML,
so golden outputs are stable across machines and Spark parallelism
levels. No external data.
"""

from __future__ import annotations

import random
import zlib

_WORDS = (
    "the quick brown fox jumps over a lazy dog while reading newspapers "
    "about politics economics science culture technology health education "
    "government community development international national regional "
    "reports analysis investigation understanding considerable information "
    "particularly journalists editors readers stories conversation agents "
    "extraction pipeline measurement quality signal remarkable independent"
).split()

_FIXTURE_CLASSES = (
    "plain_article",
    "boilerplate_heavy",
    "comment_section",
    "link_dense_nav",
    "sibling_merge",
    "short_content",
    "no_content",
    "entities_whitespace",
    "script_style",
    "meta_dates",
    "images",
    "reddit_link",
    "non_html",
    "polysyllabic",
    "punctuation_edge",
    # torture classes (golden-locked versions of tests/test_torture_html.py)
    "tag_soup",
    "nested_tables",
    "cdata_comments",
    "mixed_case",
    "cousin_parts",
)


def fixture_classes() -> tuple[str, ...]:
    return _FIXTURE_CLASSES


def _sentence(rng: random.Random, n_words: int = 12, commas: int = 1) -> str:
    words = [rng.choice(_WORDS) for _ in range(n_words)]
    for i in range(commas):
        pos = rng.randrange(2, max(3, n_words - 2))
        words[pos] = words[pos] + ","
    text = " ".join(words)
    return text[0].upper() + text[1:] + "."

def _paragraph(rng: random.Random, n_sentences: int = 4) -> str:
    return " ".join(_sentence(rng, rng.randint(8, 18), rng.randint(0, 2)) for _ in range(n_sentences))


def _article_body(rng: random.Random, n_paragraphs: int = 4) -> str:
    return "\n".join(f"<p>{_paragraph(rng, rng.randint(3, 6))}</p>" for _ in range(n_paragraphs))


def _nav(rng: random.Random) -> str:
    links = "".join(f'<li><a href="/s{i}">{rng.choice(_WORDS)}</a></li>' for i in range(8))
    return f'<div class="menu navigation"><ul>{links}</ul></div>'


def _page(title: str, body: str, head_extra: str = "") -> str:
    return (
        f"<html><head><title>{title}</title>{head_extra}</head>"
        f"<body>{body}</body></html>"
    )


def make_fixture(cls: str, seed: int) -> str:
    """Build one HTML document of the given fixture class."""
    # zlib.crc32 is stable across processes (str hash() is NOT — it is
    # salted per interpreter, which would break golden determinism on
    # Spark workers)
    rng = random.Random((zlib.crc32(cls.encode()) & 0xFFFF) * 1_000_003 + seed)
    title = f"{cls} article {seed}"

    if cls == "plain_article":
        return _page(title, _article_body(rng, 5))

    if cls == "boilerplate_heavy":
        body = (
            f'<div class="header banner"><h1>Site</h1>{_nav(rng)}</div>'
            f'<div class="sidebar widget"><p>{_sentence(rng, 6)}</p>{_nav(rng)}</div>'
            f'<div class="article-content entry">{_article_body(rng, 5)}</div>'
            f'<div class="promo sponsor"><p>Buy now!</p></div>'
            f'<div class="footer"><p>Copyright</p>{_nav(rng)}</div>'
        )
        return _page(title, body)

    if cls == "comment_section":
        comments = "".join(f"<p>{_sentence(rng, 4, 0)}</p>" for _ in range(10))
        body = (
            f'<div class="post-body">{_article_body(rng, 4)}</div>'
            f'<div class="comments disqus">{comments}</div>'
        )
        return _page(title, body)

    if cls == "link_dense_nav":
        body = (
            f"{_nav(rng)}{_nav(rng)}"
            f'<div class="main-content">{_article_body(rng, 4)}</div>'
            f"{_nav(rng)}"
        )
        return _page(title, body)

    if cls == "sibling_merge":
        body = (
            f'<div class="story">'
            f'<div class="story-part">{_article_body(rng, 3)}</div>'
            f"<p>{_paragraph(rng, 4)}</p>"
            f"<p>{_paragraph(rng, 3)}</p>"
            f'<div class="story-part">{_article_body(rng, 2)}</div>'
            f"</div>"
        )
        return _page(title, body)

    if cls == "short_content":
        body = f'<div class="content"><p>{_sentence(rng, 10, 1)}</p></div>{_nav(rng)}'
        return _page(title, body)

    if cls == "no_content":
        return _page(title, f"{_nav(rng)}<div class='footer'><a href='/x'>x</a></div>")

    if cls == "entities_whitespace":
        body = (
            f"<p>{_sentence(rng, 8)}&nbsp;&amp;&nbsp;more &lt;tags&gt; &quot;quoted&quot;.</p>"
            f"<p>{_sentence(rng, 10)}   \n\n\t  {_sentence(rng, 9)}</p>"
            f"<div>line one<br><br>line two after break, with commas, here.</div>"
            f"{_article_body(rng, 3)}"
        )
        return _page(title, body)

    if cls == "script_style":
        body = (
            f"<style>.x{{color:red}}</style>"
            f"<div class='content'><script>var x = 1 < 2;</script>"
            f"{_article_body(rng, 4)}"
            f"<style>p{{margin:0}}</style></div>"
        )
        return _page(title, body)

    if cls == "meta_dates":
        head = (
            '<meta property="article:published_time" content="2025-03-14T09:30:00Z"/>'
            '<script type="application/ld+json">'
            '{"@type":"NewsArticle","datePublished":"2025-03-14T09:30:00Z"}</script>'
        )
        body = (
            f'<time datetime="2025-03-14T09:30:00Z">March 14, 2025</time>'
            f"{_article_body(rng, 4)}"
        )
        return _page(title, body, head_extra=head)

    if cls == "images":
        head = '<meta property="og:image" content="https://cdn.example.com/lead.jpg"/>'
        body = f'<img src="/relative/pic.png"/>{_article_body(rng, 4)}'
        return _page(title, body, head_extra=head)

    if cls == "reddit_link":
        body = (
            f"<p>submitted by user</p>"
            f'<p><a href="https://example.com/story-{seed}">[link]</a></p>'
            f"{_article_body(rng, 3)}"
        )
        return _page(title, body)

    if cls == "non_html":
        return _paragraph(rng, 6) + "\n\n" + _paragraph(rng, 5)

    if cls == "polysyllabic":
        poly = (
            "university organization international considerable particularly "
            "independent development education examination"
        )
        body = f"<p>Cat dog sun. {poly}. Simple words make easy reading here.</p>" + _article_body(rng, 3)
        return _page(title, body)

    if cls == "punctuation_edge":
        body = (
            "<p>Dr. Smith went to Washington!? Really... Yes!!! "
            "The U.S. economy grew</p>" + _article_body(rng, 3)
        )
        return _page(title, body)

    if cls == "tag_soup":
        # unclosed tags, misnested blocks, stray table cell — must parse,
        # never raise, and still pull the article text
        return (
            f"<html><body><div class='content'><p>intro {_paragraph(rng, 2)}"
            f"{_article_body(rng, 4)}<div><td>stray cell {_sentence(rng, 6)}"
        )

    if cls == "nested_tables":
        inner = f"<td class='content'>{_article_body(rng, 4)}</td>"
        return (
            "<table><tr>"
            + "<td><table><tr>" * 4
            + inner
            + "</tr></table></td>" * 4
            + "</tr></table>"
        )

    if cls == "cdata_comments":
        body = (
            "<!--[if IE]><div class='banner'>old browser junk</div><![endif]-->"
            f"<div class='content'><![CDATA[ not content ]]>{_article_body(rng, 4)}"
            "<!-- trailing comment --></div>"
        )
        return _page(title, body)

    if cls == "mixed_case":
        paras = "".join(
            f"<P>{_paragraph(rng, rng.randint(3, 5))}</P>" for _ in range(4)
        )
        return (
            f"<HTML><HEAD><TITLE>{title}</TITLE></HEAD><BODY>"
            f"<DIV CLASS='Article-Content'>{paras}</DIV></BODY></HTML>"
        )

    if cls == "cousin_parts":
        # split-article layout: 4 cousin cells trigger the spec's
        # >=3-alternatives ancestor promotion (readability.py step 6a)
        cells = "".join(
            f"<div class='row'><div class='cell'>{_article_body(rng, 2)}</div></div>"
            for _ in range(4)
        )
        return _page(title, f"<div class='wrapper'>{cells}</div>")

    raise ValueError(f"unknown fixture class: {cls}")
