"""REAL HTML text extraction (functions/html_extract.py): stdlib
html.parser state machine — boilerplate subtree dropping, entity
unescaping, comment handling, void elements, nested drop elements, and the
builder round-trip the registered query pins at corpus scale."""

from dbt_spark.functions.html_extract import (
    build_page,
    extract_text,
    extract_visible_text,
)


def test_basic_visible_text():
    assert extract_text("<p>hello <b>world</b></p>") == "hello world"


def test_boilerplate_subtrees_dropped():
    html = (
        "<html><head><title>T</title><style>p{}</style>"
        "<script>var a = 1;</script></head>"
        "<body><nav>home about</nav><p>real copy</p>"
        "<footer>footer text</footer></body></html>"
    )
    assert extract_text(html) == "real copy"


def test_script_with_fake_tags_inside():
    # the script content model: '<p>' inside a string literal is NOT a tag
    html = "<script>var x = \"<p>sneaky</p>\";</script><p>ok</p>"
    assert extract_text(html) == "ok"


def test_nested_drop_elements_need_depth_not_flag():
    # nav inside footer: a boolean in/out flag would re-enable collection
    # at the INNER </nav>, leaking 'leaked tail' into the output
    html = "<footer>f1 <nav>n</nav> leaked tail</footer><p>copy</p>"
    assert extract_text(html) == "copy"


def test_entities_and_charrefs_unescaped():
    assert extract_text("<p>a &amp; b &lt;c&gt; &#65;</p>") == "a & b <c> A"


def test_comments_and_void_elements():
    # tag boundaries (incl. void elements like <br>) act as whitespace —
    # 'a<br>b' is two words to a text pipeline, never 'ab'
    html = "<p>a<!-- hidden --> b<br>c<img src='x'>d</p>"
    assert extract_text(html) == "a b c d"


def test_whitespace_normalized():
    assert extract_text("<div>\n  a \t b\n\n<p> c </p></div>") == "a b c"


def test_builder_roundtrip_exact():
    for seed, text in enumerate([
        "plain words only",
        "punct & <angle> \"quotes\" 'single'",
        "  leading and   irregular\tspacing  ",
        "one",
        "",
        " ".join(f"w{i}" for i in range(50)),
    ]):
        norm = " ".join(text.split())
        assert extract_text(build_page(text, seed)) == norm, (seed, text)


def test_spark_kernel(spark):
    import hashlib

    rows = [(1, build_page("alpha beta gamma", 1)),
            (2, build_page("", 2)),
            (3, build_page("x & y", 3))]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_id"]: r for r in extract_visible_text(df).collect()}
    assert got[1]["text_md5"] == hashlib.md5(b"alpha beta gamma").hexdigest()
    assert got[1]["n_words"] == 3 and got[1]["n_chars"] == 16
    assert got[2]["text_md5"] == hashlib.md5(b"").hexdigest()
    assert got[2]["n_words"] == 0
    assert got[3]["text_md5"] == hashlib.md5(b"x & y").hexdigest()
