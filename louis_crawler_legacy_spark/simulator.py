"""Pure-Python reference crawl simulator — the equality oracle.

Reimplements the parallel spider's main loop
(goldie_playwright_parallel.py:761-865) with the deterministic tie-break
defined in SURVEY §5.3: pending is processed in total order
(depth, discovery_round, discovery_seq, url). The Spark engine
(plans/crawl.py) must produce the SAME per-round batches, seen set, pages,
and link edges on the same corpus + config — tests/test_frontier.py.

This module deliberately shares the extraction functions with the engine
(functions/extract.py): the oracle property under test is the crawl
ORCHESTRATION (ordering, dedup, budget, depth cutoff), while extraction
equality is pinned separately by its own unit tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from louis_crawler_legacy_spark.functions.extract import extract_page_fields
from louis_crawler_legacy_spark.operators.politeness import robots_blocked_py


@dataclass
class SimRound:
    round: int
    batch: list[tuple[str, int]]  # (url, depth) in batch order
    scraped: list[str]
    errored: list[str]
    new_pending: list[tuple[str, int]]


@dataclass
class SimResult:
    rounds: list[SimRound] = field(default_factory=list)
    scraped: set = field(default_factory=set)
    errored: set = field(default_factory=set)
    pages: dict = field(default_factory=dict)  # url -> item dict
    links: set = field(default_factory=set)  # (src, dst)

    @property
    def batches(self) -> list[list[str]]:
        return [[u for u, _ in r.batch] for r in self.rounds]

    @property
    def seen(self) -> set:
        return self.scraped | self.errored


def simulate_crawl(
    corpus: dict[str, dict],
    seeds: list[str],
    max_depth: int = 4,
    batch_size: int = 64,
    host_budget: int | None = None,
    host_budgets: dict[str, int] | None = None,
    allowed_domains: tuple[str, ...] = (),
    robots: dict[str, list[str]] | None = None,
    max_rounds: int = 10_000,
) -> SimResult:
    res = SimResult()
    # pending: (url, depth) -> (discovery_round, discovery_seq); insertion
    # bookkeeping gives the deterministic total order
    pending: dict[tuple[str, int], tuple[int, int]] = {}
    for i, u in enumerate(seeds):
        if u not in res.scraped and u not in res.errored:
            pending.setdefault((u, 0), (0, i))

    round_no = 0
    while pending and round_no < max_rounds:
        round_no += 1
        # --- _get_next_batch: total order, url-dedup, politeness cap -------
        ordered = sorted(
            pending.items(), key=lambda kv: (kv[0][1], kv[1][0], kv[1][1], kv[0][0])
        )
        batch: list[tuple[str, int]] = []
        batch_urls: set[str] = set()
        host_taken: dict[str, int] = {}
        for (url, depth), _disc in ordered:
            if len(batch) >= batch_size:
                break
            if url in res.scraped or url in batch_urls:
                continue
            host = url.split("/")[2]
            cap = (host_budgets or {}).get(host, host_budget)
            if cap is not None and host_taken.get(host, 0) >= cap:
                continue
            batch.append((url, depth))
            batch_urls.add(url)
            host_taken[host] = host_taken.get(host, 0) + 1

        if not batch:
            break

        # --- fetch + extract ------------------------------------------------
        scraped_now: list[str] = []
        errored_now: list[str] = []
        results = []
        for url, depth in batch:
            rec = corpus.get(url)
            if rec is None or rec["status"] >= 400:
                errored_now.append(url)
                continue
            fields = extract_page_fields(
                rec["html"], url, list(allowed_domains) or None
            )
            scraped_now.append(url)
            results.append((url, depth, fields))
            res.pages[url] = {
                "url": url,
                "title": fields["title"],
                "lang": fields["lang"],
                "html_content": fields["content"],
                "last_updated": fields["last_updated"],
                "children": fields["children"],
                "depth": depth,
            }
            for child in fields["children"]:
                res.links.add((url, child))

        # --- state updates in the reference's order (:839-849) -------------
        res.scraped.update(scraped_now)
        res.errored.update(errored_now)
        for url, _d in batch:
            for key in [k for k in pending if k[0] == url]:
                del pending[key]

        # --- add new pending (:815-824 + :606-626) ---------------------------
        new_pending: list[tuple[str, int]] = []
        seq = 0
        for url, depth, fields in results:
            next_depth = depth + 1
            if next_depth > max_depth:
                continue
            for child in fields["children"]:
                if child in res.scraped or child in res.errored:
                    continue
                if robots_blocked_py(child, robots):
                    continue
                key = (child, next_depth)
                if key in pending:
                    continue
                seq += 1
                pending[key] = (round_no, seq)
                new_pending.append(key)

        res.rounds.append(
            SimRound(round_no, batch, scraped_now, errored_now, new_pending)
        )
    return res
