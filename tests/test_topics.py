"""MQTT wildcard grammar (SURVEY.md §2 A3; OASIS MQTT 3.1.1 §4.7)."""

import re

import pytest

from mqtt2sql_spark.functions.topics import mqtt_pattern_to_regex


@pytest.mark.parametrize(
    ("pattern", "topic", "match"),
    [
        ("sensors/+/temp", "sensors/kitchen/temp", True),
        ("sensors/+/temp", "sensors/a/b/temp", False),
        ("sensors/+/temp", "sensors/temp", False),
        ("home/#", "home/a/b/c", True),
        ("home/#", "home", True),  # '#' matches the parent level itself
        ("home/#", "homely", False),
        ("#", "anything/at/all", True),
        ("+", "one", True),
        ("+", "one/two", False),
        ("a/+/+", "a/b/c", True),
        ("a/+/+", "a/b", False),
        # regex metachars in literal levels must be escaped
        ("a.b/+", "a.b/c", True),
        ("a.b/+", "axb/c", False),
    ],
)
def test_wildcard_translation(pattern, topic, match):
    assert bool(re.match(mqtt_pattern_to_regex(pattern), topic)) == match


def test_hash_must_be_last_level():
    with pytest.raises(ValueError):
        mqtt_pattern_to_regex("a/#/b")
