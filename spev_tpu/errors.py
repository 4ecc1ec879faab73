"""Framework-wide error taxonomy.

`UserError` marks failures caused by user input — bad flag values, malformed
files, out-of-range controls — as opposed to internal bugs.  The CLI guard
(`cli/common.cli_guard`) converts only these (plus missing-path OSErrors)
into clean one-line exits; genuine internal errors (shape/dtype mismatches
deep in JAX graphs) keep their tracebacks.

Subclasses ValueError so library callers that catch ValueError keep working.
"""


class UserError(ValueError):
    """A failure attributable to user input, not a framework bug."""
