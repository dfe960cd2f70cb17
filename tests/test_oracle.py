"""Port of the reference detector/accumulator unit tests against the pure
Python oracle (SURVEY.md §5.1-5.2).

Every scenario from test/plugin/test_exception_detector.rb is reproduced:
per-fixture status protocol (:597-606), per-language tests (:608-706),
reset (:708-717), buffer grouping (:734-759), JSON field selection
(:782-806) and max_lines / max_bytes boundaries (:808-850).
"""

from __future__ import annotations

import pytest

from fluent_plugin_detect_exceptions_spark import fixtures as fx
from fluent_plugin_detect_exceptions_spark.oracle import (
    END_TRACE,
    INSIDE_TRACE,
    NO_TRACE,
    START_TRACE,
    Accumulator,
    Detector,
)
from fluent_plugin_detect_exceptions_spark.rules import compile_rules


def check_multiline(detector, expected_first, expected_last, multiline):
    lines = fx.lines(multiline)
    for index, line in enumerate(lines):
        action = detector.update(line)
        if index == 0:
            assert action == expected_first, f"first line: {line!r} -> {action}"
        elif index == len(lines) - 1:
            assert action == expected_last, f"last line: {line!r} -> {action}"
        else:
            assert action == INSIDE_TRACE, f"line not buffered: {line!r} -> {action}"


def check_no_multiline(detector, text):
    for line in fx.lines(text):
        assert detector.update(line) == NO_TRACE, f"unexpected action on {line!r}"


def check_exception(exception, detects_end):
    detector = Detector()
    after_exc = END_TRACE if detects_end else INSIDE_TRACE
    before_second_exc = INSIDE_TRACE if detects_end else START_TRACE
    check_multiline(detector, NO_TRACE, NO_TRACE, "This is not an exception.")
    check_multiline(detector, INSIDE_TRACE, after_exc, exception)
    check_multiline(detector, NO_TRACE, NO_TRACE, "This is not an exception.")
    check_multiline(detector, INSIDE_TRACE, after_exc, exception)
    check_multiline(detector, before_second_exc, after_exc, exception)


# fixture name -> detects_end (only PYTHON_EXC and PHP_ON_GAE_EXC have
# explicit end rules — test_exception_detector.rb:627,:632)
PROTOCOL_CASES = [
    ("JAVA_EXC", False),
    ("COMPLEX_JAVA_EXC", False),
    ("NESTED_JAVA_EXC", False),
    ("NODE_JS_EXC", False),
    ("CLIENT_JS_EXC", False),
    ("V8_JS_EXC", False),
    ("CSHARP_EXC", False),
    ("CSHARP_NESTED_EXC", False),
    ("CSHARP_ASYNC_EXC", False),
    ("PYTHON_EXC", True),
    ("PHP_EXC", False),
    ("PHP_ON_GAE_EXC", True),
    ("GO_EXC", False),
    ("GO_ON_GAE_EXC", False),
    ("GO_SIGNAL_EXC", False),
    ("GO_HTTP", False),
    ("RUBY_EXC", False),
    ("RAILS_EXC", False),
    ("DART_ERR", False),
    ("DART_EXC", False),
    ("DART_ASYNC_ERR", False),
    ("DART_DIVIDE_BY_ZERO_ERR", False),
    ("DART_ARGUMENT_ERR", False),
    ("DART_RANGE_ERR", False),
    ("DART_READ_STATIC_ERR", False),
    ("DART_UNIMPLEMENTED_ERROR", False),
    ("DART_UNSUPPORTED_ERR", False),
    ("DART_CONCURRENT_MODIFICATION_ERR", False),
    ("DART_OOM_ERR", False),
    ("DART_STACK_OVERFLOW_ERR", False),
    ("DART_FALLTHROUGH_ERR", False),
    ("DART_TYPE_ERR", False),
    ("DART_FORMAT_ERR", False),
    ("DART_FORMAT_WITH_CODE_ERR", False),
    ("DART_NO_METHOD_ERR", False),
    ("DART_NO_METHOD_GLOBAL_ERR", False),
    ("DART_ASSERTION_ERR", False),
    ("DART_ABSTRACT_CLASS_ERR", False),
]


@pytest.mark.parametrize("name,detects_end", PROTOCOL_CASES)
def test_status_protocol(name, detects_end):
    check_exception(fx.DETECTOR_FIXTURES[name], detects_end)


def test_mixed_languages_sequential():
    # all fixtures through one :all detector back to back (ref :670-706)
    for name, detects_end in PROTOCOL_CASES:
        check_exception(fx.DETECTOR_FIXTURES[name], detects_end)


def test_reset():
    detector = Detector()
    check_multiline(detector, INSIDE_TRACE, INSIDE_TRACE, fx.JAVA_EXC_PART1)
    check_multiline(detector, INSIDE_TRACE, INSIDE_TRACE, fx.JAVA_EXC_PART2)
    check_multiline(detector, START_TRACE, INSIDE_TRACE, fx.JAVA_EXC_PART1)
    detector.reset()
    check_no_multiline(detector, fx.JAVA_EXC_PART2)


def test_unknown_language_raises():
    with pytest.raises(ValueError, match="Unknown language"):
        compile_rules(["klingon"])


def test_rule_dedupe():
    # G3/G4 duplicate (pattern '^$' -> go_goroutine) under go_after_panic is
    # deduped (exception_detector.rb:198; RuleTarget equality :29-41)
    rules = compile_rules(["go"])
    from fluent_plugin_detect_exceptions_spark.rules import STATE_INDEX

    targets = rules.by_state[STATE_INDEX["go_after_panic"]]
    assert len(targets) == len(set(targets))
    pats = [rules.patterns[p] for p, _ in targets]
    assert pats.count(r"^$") == 1


# -- accumulator scenarios (ref :719-806) -----------------------------------


def feed_lines(acc, *messages):
    for m in messages:
        for line in fx.lines(m):
            acc.push(0, line)
        acc.flush()


def records(acc):
    return [e.record for e in acc.out]


BUFFER_SCENARIOS = [
    ("mixed languages", ["all"],
     [fx.JAVA_EXC, fx.ARBITRARY_TEXT, fx.PYTHON_EXC, fx.GO_EXC],
     [fx.JAVA_EXC] + fx.lines(fx.ARBITRARY_TEXT) + [fx.PYTHON_EXC, fx.GO_EXC]),
    ("single language", ["go"],
     [fx.JAVA_EXC, fx.ARBITRARY_TEXT, fx.GO_EXC],
     fx.lines(fx.JAVA_EXC) + fx.lines(fx.ARBITRARY_TEXT) + [fx.GO_EXC]),
    ("some exceptions from non-configured languages", ["python"],
     [fx.JAVA_EXC, fx.PYTHON_EXC, fx.GO_EXC],
     fx.lines(fx.JAVA_EXC) + [fx.PYTHON_EXC] + fx.lines(fx.GO_EXC)),
    ("all exceptions from non-configured languages", ["ruby"],
     [fx.JAVA_EXC, fx.PYTHON_EXC, fx.GO_EXC],
     fx.lines(fx.JAVA_EXC) + fx.lines(fx.PYTHON_EXC) + fx.lines(fx.GO_EXC)),
]


@pytest.mark.parametrize("desc,languages,inputs,expected", BUFFER_SCENARIOS)
def test_buffer(desc, languages, inputs, expected):
    acc = Accumulator(None, languages)
    feed_lines(acc, *inputs)
    assert records(acc) == expected, desc


JSON_SCENARIOS = [
    ("User-defined message field", "mydata", "mydata",
     [fx.PYTHON_EXC, fx.ARBITRARY_TEXT, fx.GO_EXC],
     [fx.PYTHON_EXC] + fx.lines(fx.ARBITRARY_TEXT) + [fx.GO_EXC]),
    ('Default message field "message"', "", "message",
     [fx.PYTHON_EXC, fx.ARBITRARY_TEXT, fx.GO_EXC],
     [fx.PYTHON_EXC] + fx.lines(fx.ARBITRARY_TEXT) + [fx.GO_EXC]),
    ('Default message field "log"', "", "log",
     [fx.PYTHON_EXC, fx.ARBITRARY_TEXT, fx.GO_EXC],
     [fx.PYTHON_EXC] + fx.lines(fx.ARBITRARY_TEXT) + [fx.GO_EXC]),
    ("Wrongly defined message field", "doesnotexist", "mydata",
     [fx.PYTHON_EXC, fx.ARBITRARY_TEXT, fx.GO_EXC],
     fx.lines(fx.PYTHON_EXC) + fx.lines(fx.ARBITRARY_TEXT) + fx.lines(fx.GO_EXC)),
    ("Undefined message field", "", "mydata",
     [fx.PYTHON_EXC, fx.ARBITRARY_TEXT, fx.GO_EXC],
     fx.lines(fx.PYTHON_EXC) + fx.lines(fx.ARBITRARY_TEXT) + fx.lines(fx.GO_EXC)),
]


@pytest.mark.parametrize("desc,configured,actual,inputs,outputs", JSON_SCENARIOS)
def test_json_messages(desc, configured, actual, inputs, outputs):
    acc = Accumulator(configured, ["all"])
    for m in inputs:
        for line in fx.lines(m):
            acc.push(0, {actual: line})
        acc.flush()
    expected = [{actual: "".join(m) if isinstance(m, list) else m} for m in outputs]
    assert records(acc) == expected, desc


def test_max_lines_limit():
    max_lines = len(fx.lines(fx.JAVA_EXC_PART1))
    acc = Accumulator(None, ["all"], max_lines=max_lines)
    feed_lines(acc, fx.JAVA_EXC)
    assert records(acc) == [fx.JAVA_EXC_PART1] + fx.lines(fx.JAVA_EXC_PART2)


def test_high_max_bytes_limit():
    max_bytes = len(fx.JAVA_EXC_PART1) + len(fx.lines(fx.JAVA_EXC_PART2)[0]) - 1
    acc = Accumulator(None, ["all"], max_bytes=max_bytes)
    feed_lines(acc, fx.JAVA_EXC)
    assert records(acc) == [fx.JAVA_EXC_PART1] + fx.lines(fx.JAVA_EXC_PART2)


def test_low_max_bytes_limit():
    max_bytes = len(fx.JAVA_EXC_PART1)
    acc = Accumulator(None, ["all"], max_bytes=max_bytes)
    feed_lines(acc, fx.JAVA_EXC)
    assert records(acc) == [fx.JAVA_EXC_PART1] + fx.lines(fx.JAVA_EXC_PART2)


def test_force_line_breaks():
    # e2e analogue of test_out_detect_exceptions.rb:288-305: feeding the Java
    # trace with newlines stripped and force_line_breaks=true reconstructs
    # JAVA_EXC minus the final newline.
    acc = Accumulator("message", ["all"], force_line_breaks=True)
    for line in fx.lines(fx.PLUGIN_JAVA_EXC):
        acc.push(0, {"message": line.rstrip("\n")})
    acc.force_flush()
    assert records(acc) == [{"message": fx.PLUGIN_JAVA_EXC.rstrip("\n")}]


def test_timeout_gap_split():
    # test_out_detect_exceptions.rb:219-236 as event-time gaps
    acc = Accumulator("message", ["all"], flush_interval=1)
    t = 1000
    for i, line in enumerate(fx.lines(fx.PLUGIN_JAVA_EXC)):
        acc.push(t + i, {"message": line})
    t2 = t + len(fx.lines(fx.PLUGIN_JAVA_EXC)) + 2  # gap of > 1s
    acc.push(t2, {"message": "  at x\n"})
    acc.push(t2 + 1, {"message": "  at y\n"})
    acc.force_flush()
    assert records(acc) == [
        {"message": fx.PLUGIN_JAVA_EXC},
        {"message": "  at x\n"},
        {"message": "  at y\n"},
    ]


def test_no_timeout_no_split():
    acc = Accumulator("message", ["all"])
    t = 1000
    for i, line in enumerate(fx.lines(fx.PLUGIN_JAVA_EXC)):
        acc.push(t + i, {"message": line})
    acc.push(t + 100, {"message": "  at x\n"})
    acc.push(t + 101, {"message": "  at y\n"})
    acc.force_flush()
    assert records(acc) == [{"message": fx.PLUGIN_JAVA_EXC + "  at x\n  at y\n"}]


def test_flush_after_max_lines_e2e():
    # test_out_detect_exceptions.rb:307-326
    acc = Accumulator("message", ["all"], max_lines=2)
    for m in (fx.PLUGIN_PYTHON_EXC, fx.PLUGIN_JAVA_EXC):
        for line in fx.lines(m):
            acc.push(0, {"message": line})
    acc.force_flush()
    py, ja = fx.lines(fx.PLUGIN_PYTHON_EXC), fx.lines(fx.PLUGIN_JAVA_EXC)
    expected = (
        ["".join(py[0:2])] + py[2:] + ["".join(ja[0:2])] + ["".join(ja[2:4])] + ja[4:]
    )
    assert records(acc) == [{"message": m} for m in expected]


def test_nil_message_records():
    # nil-message record: FSM reset + pass-through when buffer empty,
    # dropped when buffer non-empty (exception_detector.rb:279-283,:349-351)
    acc = Accumulator("message", ["all"])
    acc.push(0, {"other": "x"})  # buffer empty -> passes through
    for line in fx.lines(fx.PLUGIN_JAVA_EXC)[:2]:
        acc.push(0, {"message": line})
    acc.push(0, {"other": "y"})  # buffer non-empty -> flush-around, dropped
    acc.push(0, {"message": "tail\n"})
    acc.force_flush()
    ja = fx.lines(fx.PLUGIN_JAVA_EXC)
    assert records(acc) == [
        {"other": "x"},
        {"message": ja[0] + ja[1]},
        {"message": "tail\n"},
    ]
