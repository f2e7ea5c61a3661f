"""Output path templating and file naming (reference O12/O13).

``decorate_directory_with_time`` replaces ``{pattern}`` tokens in the
output prefix with values formatted from the upload instant
(DynamicPath.scala:35-62: each brace group is a Java
DateTimeFormatter pattern; invalid patterns keep their literal text;
the result is slash-normalized). ``base_filename`` reproduces the
emitter's object naming
``[prefix-][partition-]yyyy-MM-dd-HHmmss-firstSeq-lastSeq``
(KinesisS3Emitter.scala:226-244) with Spark's batchId + offset range
standing in for Kinesis sequence numbers (SURVEY §7 risk 2).

These are driver-side pure functions (they name files, they don't
touch data), so plain Python is the right altitude — NOT a UDF.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

_TOKEN = re.compile(r"\{([^{}]*)\}")

# Java DateTimeFormatter symbols → strftime equivalents for the subset
# that round-trips; anything outside stays literal (matching the
# reference's "invalid pattern keeps literal text" behavior,
# DynamicPath.scala:55-58 via try/catch).
_JAVA_TO_STRFTIME = {
    # Java 'Y' is WEEK-BASED year (DateTimeFormatter): Dec 29-31 can
    # belong to the next week-based year. glibc strftime %G/%g are the
    # ISO week-based equivalents (DynamicPath.scala token semantics).
    # Locale caveat: the reference's output is LOCALE-DEPENDENT — its
    # DateTimeFormatter uses the JVM default locale's WeekFields, so
    # e.g. en-US (Sunday start, minimalDays=1) diverges from ISO around
    # Dec 26 - Jan 3. %G matches the ISO/ROOT-adjacent behavior — a
    # reasonable canonical choice, identical to the reference only in
    # ISO-week locales.
    "YYYY": "%G",
    "yyyy": "%Y",
    "YY": "%g",
    "yy": "%y",
    "MM": "%m",
    "dd": "%d",
    "HH": "%H",
    "mm": "%M",
    "ss": "%S",
    "DD": "%j",
}


def _format_token(pattern: str, t: datetime) -> str:
    fmt = _JAVA_TO_STRFTIME.get(pattern)
    if fmt is None:
        # composite patterns like "YYYY/MM": translate piecewise if every
        # alpha run is known, else keep the literal text
        out, i = [], 0
        for m in re.finditer(r"[A-Za-z]+", pattern):
            if m.group(0) not in _JAVA_TO_STRFTIME:
                return pattern
            out.append(pattern[i : m.start()])
            out.append(_JAVA_TO_STRFTIME[m.group(0)])
            i = m.end()
        out.append(pattern[i:])
        fmt = "".join(out)
    return t.strftime(fmt)


def decorate_directory_with_time(file_name: str, t: datetime) -> str:
    """Substitute ``{DateTimeFormatter}`` tokens with UTC-formatted
    values and normalize duplicate slashes (DynamicPath.scala:35-64)."""
    if t.tzinfo is not None:
        t = t.astimezone(timezone.utc).replace(tzinfo=None)
    decorated = _TOKEN.sub(lambda m: _format_token(m.group(1), t), file_name)
    # normalize: collapse duplicate slashes, keep scheme-like prefixes out
    # of scope (the reference normalizes a relative key the same way)
    return re.sub(r"/{2,}", "/", decorated)


def base_filename(
    t: datetime,
    first_seq: str,
    last_seq: str,
    output_directory: str | None = None,
    date_format: str | None = None,
    filename_prefix: str | None = None,
    partition: str | None = None,
) -> str:
    """Object base name per KinesisS3Emitter.getBaseFilename
    (KinesisS3Emitter.scala:226-244): optional directory, optional
    ``{token}`` date path, then
    ``[prefix-][partition-]yyyy-MM-dd-HHmmss-first-last``."""
    if t.tzinfo is not None:
        t = t.astimezone(timezone.utc).replace(tzinfo=None)
    parts = []
    if output_directory:
        parts.append(output_directory.rstrip("/"))
    if date_format:
        parts.append(decorate_directory_with_time(date_format, t).strip("/"))
    leaf = "-".join(
        x
        for x in (
            filename_prefix,
            partition,
            t.strftime("%Y-%m-%d-%H%M%S"),
            str(first_seq),
            str(last_seq),
        )
        if x
    )
    parts.append(leaf)
    return re.sub(r"/{2,}", "/", "/".join(parts))
