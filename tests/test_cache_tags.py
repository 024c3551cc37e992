"""No-Spark invariants of the persisted-cache tag protocol
(plans/raw_ops.py:_cache_tag — round-10 ADVICE #2 / round-11 VERDICT
#3): the tag must be unique per RAW corpus path even when the
SQL-identifier sanitization collides, or two corpora would share one
cache location and the loser would silently probe the other corpus's
artifact (postings, ANN codes) — failing candidate tests without error.
"""

from __future__ import annotations

import re

from accounts_receivable_data_pipeline_api_spark.plans.raw_ops import _cache_tag


def test_sanitization_collisions_get_distinct_tags():
    # the exact collision class the md5 suffix exists for: paths that
    # differ only in characters the identifier sanitization folds
    a = _cache_tag("v1", "/root/testdata/sf0.1")
    b = _cache_tag("v1", "/root/testdata/sf0_1")
    c = _cache_tag("v1", "/root/testdata/sf0-1")
    assert len({a, b, c}) == 3, (a, b, c)
    # and the sanitized stem still collides — proving the md5 is what
    # disambiguates, not an accident of the inputs
    strip = lambda t: re.sub(r"_[0-9a-f]{8}$", "", t)  # noqa: E731
    assert strip(a) == strip(b) == strip(c)


def test_tag_is_identifier_safe_and_version_scoped():
    tag = _cache_tag("v2_b256", "/some/dir/sf0.01/")
    assert re.fullmatch(r"[A-Za-z0-9_]+", tag), tag
    # trailing-slash normalization: one corpus, one tag
    assert tag == _cache_tag("v2_b256", "/some/dir/sf0.01")
    # version bumps relocate the cache (layout changes never misread
    # files written under an old layout)
    assert tag != _cache_tag("v3_b256", "/some/dir/sf0.01")
