"""One-shot generator for fluent_plugin_detect_exceptions_spark/fixtures.py.

Parses the Ruby heredoc fixture constants out of the reference test files
(test data only, per FIXTURES.md: "copy them verbatim when generating rows")
and emits a Python module with byte-exact texts.  Handles both squiggly
(`<<~`, strips minimal common indentation of non-empty lines) and plain
(`<<`) heredocs.
"""

from __future__ import annotations

import re
import textwrap
from pathlib import Path

REF = Path("/root/reference/test/plugin")
OUT = Path("/root/repo/fluent_plugin_detect_exceptions_spark/fixtures.py")

HEREDOC_RE = re.compile(r"^\s*([A-Z][A-Z0-9_]*)\s*=\s*<<(~?)([A-Z0-9_]+)\.freeze")


def extract(path: Path) -> dict[str, str]:
    fixtures: dict[str, str] = {}
    lines = path.read_text().splitlines(keepends=True)
    i = 0
    while i < len(lines):
        m = HEREDOC_RE.match(lines[i])
        if not m:
            i += 1
            continue
        name, squiggly, tag = m.groups()
        body_lines = []
        i += 1
        while i < len(lines) and lines[i].strip() != tag:
            body_lines.append(lines[i])
            i += 1
        body = "".join(body_lines)
        if squiggly:
            body = textwrap.dedent(body)
        fixtures[name] = body
        i += 1
    return fixtures


def main() -> None:
    det = extract(REF / "test_exception_detector.rb")
    out = extract(REF / "test_out_detect_exceptions.rb")

    parts = [
        '"""Exception fixture texts, byte-exact from the reference test suite.\n',
        "Bodies are test *data* (FIXTURES.md §2: copy verbatim).  `DETECTOR_*`\n",
        "names come from test_exception_detector.rb:19-571, `PLUGIN_*` names from\n",
        "test_out_detect_exceptions.rb:33-65.  Feed lines retain their trailing\n",
        'newline (Ruby String#lines semantics — SURVEY.md §4.4).\n"""\n\n',
        "# fmt: off\n",
    ]
    for name, body in det.items():
        parts.append(f"{name} = {body!r}\n\n")
    # JAVA_EXC is derived in the reference (test_exception_detector.rb:31)
    parts.append("JAVA_EXC = JAVA_EXC_PART1 + JAVA_EXC_PART2\n\n")
    for name, body in out.items():
        if name == "CONFIG":
            continue
        parts.append(f"PLUGIN_{name} = {body!r}\n\n")
    parts.append(
        "PLUGIN_ARBITRARY_TEXT = 'This line is not an exception.'\n\n"
        "DETECTOR_FIXTURES = {\n"
    )
    for name in det:
        parts.append(f"    {name!r}: {name},\n")
    parts.append("    'JAVA_EXC': JAVA_EXC,\n}\n\n")
    parts.append(
        "def lines(text):\n"
        '    """Split like Ruby String#lines: keep line terminators."""\n'
        "    return text.splitlines(keepends=True)\n"
    )
    parts.append("# fmt: on\n")
    OUT.write_text("".join(parts))
    print(f"wrote {OUT} with {len(det)} detector + {len(out)} plugin fixtures")
    for name in det:
        print(" ", name, len(det[name].splitlines()), "lines")


if __name__ == "__main__":
    main()
