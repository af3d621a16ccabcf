"""Search-box query mini-language → structured clauses.

The front-door grammar every engine's serving layer needs, kept
deliberately small and deterministic:

- ``"exact phrase"`` — quoted spans must match consecutively
- ``"a b"~N`` — proximity phrase: terms IN ORDER within a span of
  ``len + N`` tokens (ordered span with slop — the explicit reading of
  Lucene's phrase slop, composed from the oracle-gated span operator;
  a malformed slop suffix fails loud)
- ``+term`` — required (boolean AND side)
- ``-term`` — excluded (AND-NOT side)
- bare terms — scoring terms (BM25 "should"; they rank, and when no
  ``+``/phrase clause exists they also define the candidate set)
- ``term^2.0`` — per-term boost on a bare or ``+`` term (scales the
  term's idf weight; the Lucene ^boost operator); boost must parse as a
  positive float, last boost wins when a term repeats
- ``term~`` — fuzzy scoring term: expands to every dictionary term
  within edit distance 1 and scores as ONE synonym group (the Lucene
  multi-term rewrite to SynonymQuery); bare terms only
- ``wild*card`` / ``wi?d`` — wildcard scoring term, same synonym-group
  rewrite over the glob dictionary scan; bare terms only.  ``~`` and
  wildcards cannot combine with ``^boost`` in one query (fail loud)
- ``field:value`` — metadata filter; supported fields: ``lang``

Semantics composed from the engine's existing verified operators, so the
parser adds surface, not new retrieval code paths.  Unknown fields and
empty queries fail loud.  Tokens inside phrases/terms are run through
the engine's own tokenizer downstream, so parsing never re-tokenizes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_TOKEN_RE = re.compile(
    r"""
    "(?P<phrase>[^"]*)"(?P<slop>~\S+)?   # quoted phrase, optional ~N slop
    | (?P<plus>\+\S+)            # +required
    | (?P<minus>-\S+)            # -excluded
    | (?P<field>[A-Za-z_]+:\S+)  # field:value
    | (?P<term>\S+)              # bare scoring term
    """,
    re.VERBOSE,
)

SUPPORTED_FIELDS = ("lang",)


@dataclass
class ParsedQuery:
    phrases: list[list[str]] = field(default_factory=list)
    # ``"..."~N`` proximity clauses: (tokens, slop) — terms IN ORDER
    # within a span of len(tokens)+slop tokens (ordered span with slop;
    # a deliberately explicit simplification of Lucene's move-distance
    # slop, composed from the oracle-gated span operator)
    prox: list[tuple] = field(default_factory=list)
    must: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    should: list[str] = field(default_factory=list)
    filters: dict = field(default_factory=dict)
    boosts: dict = field(default_factory=dict)  # term -> ^boost weight
    fuzzy: list[str] = field(default_factory=list)      # term~ bodies
    wildcards: list[str] = field(default_factory=list)  # glob patterns


def _split_boost(tok: str) -> tuple[str, float | None]:
    """Strip a trailing ``^boost``; a suffix that doesn't parse as a
    float stays part of the term (never a silent reinterpretation)."""
    if "^" in tok:
        body, _, tail = tok.rpartition("^")
        try:
            b = float(tail)
        except ValueError:
            return tok, None
        if not body:
            raise ValueError(f"boost without a term: {tok!r}")
        if b <= 0:
            raise ValueError(f"boost must be > 0 in {tok!r}")
        return body, b
    return tok, None


def _reject_multiterm(body: str, clause: str) -> None:
    """Fuzzy/wildcard operators are bare-scoring-term only; on +must /
    -not clauses the tokenizer would silently strip the metachars and
    match fragment terms the user never typed — fail loud instead."""
    if "*" in body or "?" in body or body.endswith("~"):
        raise ValueError(
            f"~fuzzy/wildcard operators are not supported on {clause} "
            f"clauses (got {body!r}) — use a bare scoring term"
        )


def parse_query(s: str, tokenize) -> ParsedQuery:
    """Parse a search-box string; ``tokenize`` is the ENGINE's tokenizer
    (the build's mapper), applied to every clause body so parsed terms
    are exactly what the dictionary holds."""
    if not s or not s.strip():
        raise ValueError("empty query")
    out = ParsedQuery()
    for m in _TOKEN_RE.finditer(s):
        if m.group("phrase") is not None:
            toks = tokenize(m.group("phrase"))
            slop_s = m.group("slop")
            if slop_s is not None:
                if not re.fullmatch(r"~\d+", slop_s):  # \d+ excludes signs
                    raise ValueError(
                        f'phrase slop must be "~<non-negative int>", got '
                        f"{slop_s!r}"
                    )
                if toks:
                    out.prox.append((toks, int(slop_s[1:])))
            elif toks:
                out.phrases.append(toks)
        elif m.group("plus"):
            body, boost = _split_boost(m.group("plus")[1:])
            _reject_multiterm(body, "+must")
            toks = tokenize(body)
            out.must.extend(toks)
            if boost is not None:
                out.boosts.update({t: boost for t in toks})
        elif m.group("minus"):
            body = m.group("minus")[1:]
            _reject_multiterm(body, "-not")
            out.must_not.extend(tokenize(body))
        elif m.group("field"):
            k, v = m.group("field").split(":", 1)
            if k not in SUPPORTED_FIELDS:
                raise ValueError(
                    f"unknown query field {k!r} (supported: "
                    f"{', '.join(SUPPORTED_FIELDS)})"
                )
            out.filters[k] = v
        else:
            # boost-split FIRST so "sp*^2.0" / "spak~^2.0" hit the loud
            # boost+multiterm rejection instead of silently becoming a
            # glob over the literal "^2.0" suffix
            body, boost = _split_boost(m.group("term"))
            is_fuzzy = body.endswith("~")
            has_wild = "*" in body or "?" in body
            if (is_fuzzy or has_wild) and boost is not None:
                raise ValueError(
                    "^boost cannot combine with ~fuzzy/wildcard terms "
                    f"in one query (got {m.group('term')!r})"
                )
            if is_fuzzy:
                base = body[:-1]
                if not base or "~" in base or "*" in base or "?" in base:
                    raise ValueError(f"malformed fuzzy term {body!r}")
                toks = tokenize(base)
                if len(toks) != 1:
                    raise ValueError(
                        f"fuzzy operator needs a single term, got {body!r}"
                    )
                out.fuzzy.append(toks[0])
                continue
            if has_wild:
                # the glob is NOT tokenized (the tokenizer would strip
                # the metachars); lowercase to match the dictionary
                out.wildcards.append(body.lower())
                continue
            toks = tokenize(body)
            out.should.extend(toks)
            if boost is not None:
                out.boosts.update({t: boost for t in toks})
    if (out.fuzzy or out.wildcards) and out.boosts:
        raise ValueError(
            "^boost cannot combine with ~fuzzy/wildcard terms in one "
            "query (synonym-group scoring has no per-term boosts)"
        )
    if not (
        out.phrases
        or out.prox
        or out.must
        or out.should
        or out.fuzzy
        or out.wildcards
    ):
        raise ValueError(
            "query has no positive clause (only exclusions/filters) — "
            "add a term, +term, or \"phrase\""
        )
    return out
