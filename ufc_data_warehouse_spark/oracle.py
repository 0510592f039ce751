"""DuckDB oracle SQL for every model — the correctness gate's other half.

For each Spark model in ``models/`` this module produces an equivalent
ANSI/DuckDB SQL statement over the SAME testdata parquet (via the synth CTEs
from :mod:`.synth`). Dialect translations from the reference's Postgres SQL:

- POSIX classes ``[[:space:]]`` → ``\\s`` (RE2 + Java agree);
- ``to_date(s, fmt)`` → regex-guarded ``strptime``;
- PG default null ordering spelled explicitly (ASC NULLS LAST / DESC NULLS
  FIRST) since DuckDB/Spark defaults differ (SURVEY O2);
- ``sum(int)`` → ``::BIGINT`` (DuckDB's HUGEINT would mismatch Spark's long);
- ``current_date`` → pinned ``AS_OF_DATE`` (SURVEY X9);
- unique fight ``url`` appended to under-determined window orderings,
  mirroring the Spark side (see models/analytics.py docstring).
"""

from __future__ import annotations

from .models.title_reigns import AS_OF_DATE
from .synth import synth_ctes

# ---------------------------------------------------------------------------
# reusable fragments
# ---------------------------------------------------------------------------


def _cascade(col: str) -> str:
    """4-format regex-guarded date parse (stg_event_details.sql:16-26)."""
    return f"""CASE
      WHEN regexp_matches({col}, '^[A-Za-z]{{3}}\\s+[0-9]{{1,2}},\\s+[0-9]{{4}}$')
        THEN strptime({col}, '%b %d, %Y')::DATE
      WHEN regexp_matches({col}, '^[A-Za-z]+\\s+[0-9]{{1,2}},\\s+[0-9]{{4}}$')
        THEN strptime({col}, '%B %d, %Y')::DATE
      WHEN regexp_matches({col}, '^[A-Za-z]{{3}}\\s+[0-9]{{4}}$')
        THEN strptime({col}, '%b %Y')::DATE
      WHEN regexp_matches({col}, '^[A-Za-z]+\\s+[0-9]{{4}}$')
        THEN strptime({col}, '%B %Y')::DATE
      END"""


def _wc_norm(col: str, strip_interim: bool) -> str:
    """weight_category normalizer (fct_fights.sql:10-22)."""
    inner = f"regexp_replace(regexp_replace({col}, '\\s+Title Bout\\s*$', '', 'i'), '^UFC\\s+', '', 'i')"
    if strip_interim:
        inner = f"regexp_replace({inner}, '^Interim\\s+', '', 'i')"
    return f"trim({inner})"


def _last_word(col: str) -> str:
    return f"split_part({col}, ' ', len(string_split({col}, ' ')))"


_FT_SECONDS = """CASE
      WHEN "time" IS NULL OR position(':' in "time") = 0 OR round_number IS NULL THEN NULL
      ELSE ((round_number - 1) * 300)
        + (split_part("time", ':', 1)::INT * 60) + (split_part("time", ':', 2)::INT)
      END"""

STAGING_CTES = f"""
stg_fight_results AS (
  SELECT *,
    CASE WHEN upper(outcome_1) = 'W' THEN fighter_1
         WHEN upper(outcome_2) = 'W' THEN fighter_2 END AS winner,
    CASE WHEN method ILIKE '%KO%' THEN 'KO/TKO'
         WHEN method ILIKE '%SUB%' THEN 'Submission'
         WHEN method ILIKE '%DEC%' THEN 'Decision'
         ELSE 'Other' END AS method_group,
    {_FT_SECONDS} AS fight_time_seconds,
    ({_FT_SECONDS}) / 60.0 AS fight_time_minutes
  FROM (
    SELECT trim(event) AS event, trim(bout) AS bout,
      trim(weightclass) AS weightclass, trim(method) AS method,
      nullif(trim(round), '')::INT AS round_number,
      trim("time") AS "time", trim(time_format) AS time_format, trim(url) AS url,
      split_part(trim(bout), ' vs. ', 1) AS fighter_1,
      split_part(trim(bout), ' vs. ', 2) AS fighter_2,
      split_part(trim(outcome), '/', 1) AS outcome_1,
      split_part(trim(outcome), '/', 2) AS outcome_2
    FROM fact_ufc_fight_results
  )
),
stg_event_details AS (
  SELECT event, url, location, event_date, year(event_date)::INT AS event_year
  FROM (
    SELECT trim(event) AS event, trim(url) AS url, trim(location) AS location,
      {_cascade('trim("date")')} AS event_date
    FROM dim_ufc_event_details
  )
)"""

_UND_TITLE_FILTER = """weightclass ILIKE '%Title Bout%'
      AND weightclass NOT ILIKE '%interim%' AND weightclass NOT ILIKE '%tournament%'"""

# title_fights model view, reused by multi_division_champs
_TITLE_FIGHTS_CTE = """
title_fights_v AS (
  SELECT r.event, r.bout, r.weightclass, r.method, r.round_number,
    r."time", r.time_format, r.winner, r.url, e.event_date, e.event_year, e.location
  FROM stg_fight_results r LEFT JOIN stg_event_details e ON r.event = e.event
  WHERE r.weightclass ILIKE '%Title Bout%'
)"""

# --- title_reigns CTE chain (title_reigns.sql:3-301), ends in title_reigns_out
_TITLE_REIGNS_CHAIN = f"""
ntf AS (
  SELECT event, event_date, winner, fighter_1, fighter_2, url,
    {_wc_norm('weightclass', strip_interim=False)} AS weight_category
  FROM (
    SELECT r.event, e.event_date, r.weightclass, r.fighter_1, r.fighter_2, r.winner, r.url
    FROM stg_fight_results r JOIN stg_event_details e ON r.event = e.event
    WHERE r.{_UND_TITLE_FILTER} AND r.winner IS NOT NULL
  ) WHERE weightclass IS NOT NULL AND weightclass <> ''
),
itf AS (
  SELECT event, event_date, winner, fighter_1, fighter_2, url,
    {_wc_norm('weightclass', strip_interim=True)} AS weight_category
  FROM (
    SELECT r.event, e.event_date, r.weightclass, r.fighter_1, r.fighter_2, r.winner, r.url
    FROM stg_fight_results r JOIN stg_event_details e ON r.event = e.event
    WHERE r.weightclass ILIKE '%Title Bout%' AND r.weightclass ILIKE '%interim%'
      AND r.weightclass NOT ILIKE '%tournament%' AND r.winner IS NOT NULL
  ) WHERE weightclass IS NOT NULL AND weightclass <> ''
),
champion_events AS (
  SELECT weight_category, winner AS fighter, event_date AS start_date, event, url,
    lag(winner) OVER (PARTITION BY weight_category
      ORDER BY event_date ASC NULLS LAST, event, url) AS previous_champion
  FROM ntf
),
latest_undisputed AS (
  SELECT weight_category, max(event_date) AS last_undisputed_date FROM ntf GROUP BY 1
),
latest_interim AS (
  SELECT weight_category, winner AS fighter, event_date AS start_date,
    row_number() OVER (PARTITION BY weight_category
      ORDER BY event_date DESC NULLS FIRST, event DESC, url DESC) AS interim_rank
  FROM itf
),
interim_fallback AS (
  SELECT i.weight_category, i.fighter, i.start_date, NULL::DATE AS next_champion_date
  FROM latest_interim i LEFT JOIN latest_undisputed u ON i.weight_category = u.weight_category
  WHERE i.interim_rank = 1
    AND (u.last_undisputed_date IS NULL OR u.last_undisputed_date < i.start_date)
),
new_champion_events AS (
  SELECT weight_category, fighter, start_date,
    lead(start_date) OVER (PARTITION BY weight_category
      ORDER BY start_date ASC NULLS LAST, event, url) AS next_champion_date
  FROM champion_events
  WHERE previous_champion IS NULL OR fighter <> previous_champion
  UNION ALL
  SELECT weight_category, fighter, start_date, next_champion_date FROM interim_fallback
),
fighter_name_lookup AS (
  SELECT DISTINCT weight_category, fighter_name,
    split_part(fighter_name, ' ', 1) AS first_name,
    {_last_word('fighter_name')} AS last_name
  FROM (
    SELECT weight_category, fighter_1 AS fighter_name FROM ntf
    UNION ALL
    SELECT weight_category, fighter_2 AS fighter_name FROM ntf
  ) WHERE fighter_name IS NOT NULL AND fighter_name <> ''
),
status_changes AS (
  SELECT row_number() OVER (ORDER BY change_date, fighter, weight_category) AS status_id,
    change_date,
    trim(regexp_replace(regexp_replace(weight_category, '\\s+Championship\\s*$', '', 'i'),
         '^UFC\\s+', '', 'i')) AS weight_category,
    trim(regexp_replace(regexp_replace(regexp_replace(fighter, '^Both\\s+', '', 'i'),
         '\\s*\\(.*\\)\\s*', '', 'i'), '\\s+retired\\s*$', '', 'i')) AS fighter_token,
    reason
  FROM (
    SELECT {_cascade('"date"')} AS change_date, fighter, weight_category, reason
    FROM title_status_changes_outside_octagon
  )
  WHERE change_date IS NOT NULL AND fighter IS NOT NULL AND fighter <> ''
    AND weight_category IS NOT NULL AND weight_category <> ''
),
status_matches AS (
  SELECT s.status_id, l.fighter_name,
    CASE WHEN lower(s.fighter_token) = lower(l.fighter_name) THEN 3
         WHEN lower(s.fighter_token) = lower(l.last_name) THEN 2
         WHEN lower(s.fighter_token) = lower(l.first_name) THEN 2
         WHEN lower(l.fighter_name) LIKE '%' || lower(s.fighter_token) || '%' THEN 1
         ELSE 0 END AS match_score
  FROM status_changes s
  JOIN fighter_name_lookup l ON s.weight_category = l.weight_category
   AND (lower(s.fighter_token) = lower(l.fighter_name)
     OR lower(s.fighter_token) = lower(l.first_name)
     OR lower(s.fighter_token) = lower(l.last_name)
     OR lower(l.fighter_name) LIKE '%' || lower(s.fighter_token) || '%')
),
status_best_match AS (
  SELECT status_id, fighter_name FROM (
    SELECT status_id, fighter_name,
      row_number() OVER (PARTITION BY status_id
        ORDER BY match_score DESC, fighter_name) AS match_rank
    FROM status_matches
  ) WHERE match_rank = 1
),
status_resolved AS (
  SELECT s.status_id, s.change_date, s.weight_category,
    coalesce(m.fighter_name, s.fighter_token) AS fighter_full_name, s.reason
  FROM status_changes s LEFT JOIN status_best_match m ON s.status_id = m.status_id
),
reigns_with_status AS (
  SELECT r.weight_category, r.fighter, r.start_date, r.next_champion_date,
    s.change_date AS status_end_date, s.reason AS status_end_reason,
    row_number() OVER (PARTITION BY r.weight_category, r.fighter, r.start_date
      ORDER BY s.change_date ASC NULLS LAST, s.reason ASC NULLS LAST,
               r.next_champion_date ASC NULLS LAST) AS status_rank
  FROM new_champion_events r
  LEFT JOIN status_resolved s ON s.weight_category = r.weight_category
   AND (lower(s.fighter_full_name) = lower(r.fighter)
     OR lower(s.fighter_full_name) = lower({_last_word('r.fighter')}))
   AND s.change_date >= r.start_date
   AND (r.next_champion_date IS NULL OR s.change_date < r.next_champion_date)
),
title_reigns_out AS (
  SELECT weight_category, fighter, start_date,
    coalesce(status_end_date, next_champion_date) AS end_date,
    CASE WHEN status_end_date IS NOT NULL THEN status_end_reason
         WHEN next_champion_date IS NOT NULL THEN 'lost title' END AS end_reason
  FROM reigns_with_status WHERE status_rank = 1
)"""

_TITLE_REIGNS_SELECT = """
SELECT weight_category, fighter, start_date, end_date, end_reason,
  (CASE WHEN end_date IS NULL THEN NULL ELSE (end_date - start_date) END)::BIGINT AS reign_days,
  CASE WHEN end_date IS NULL THEN 1 ELSE 0 END AS is_active
FROM title_reigns_out
ORDER BY reign_days DESC NULLS LAST, weight_category, fighter"""

# ---------------------------------------------------------------------------
# model bodies: name → (extra_ctes, final_select)
# ---------------------------------------------------------------------------

_P3 = "{c} IS NOT NULL AND {c} <> ''"


def _wins_by_method(in_list: str, out: str) -> tuple[str, str]:
    return (
        "",
        f"""
SELECT winner AS fighter, count(*) AS {out}
FROM stg_fight_results
WHERE method_group IN ({in_list}) AND winner IS NOT NULL AND winner <> ''
GROUP BY winner ORDER BY {out} DESC, fighter""",
    )


_FIGHT_ORDER = "event_date ASC NULLS LAST, event, bout, fight_id"

MODEL_BODIES: dict[str, tuple[str, str]] = {
    # ---- staging (stg_fight_results.sql / stg_event_details.sql — exposed
    # as first-class oracle-gated queries, not only as CTEs under every
    # downstream model) --------------------------------------------------
    "stg_fight_results": ("", "SELECT * FROM stg_fight_results"),
    "stg_event_details": ("", "SELECT * FROM stg_event_details"),
    # ---- core --------------------------------------------------------------
    "fct_fights": (
        "",
        f"""
SELECT r.url AS fight_id, r.event AS event_name, e.event_date, r.bout,
  r.weightclass AS weightclass_raw,
  {_wc_norm('r.weightclass', strip_interim=True)} AS weight_category,
  r.fighter_1, r.fighter_2, r.winner, r.method, r.round_number, r."time",
  r.time_format, r.method_group, r.fight_time_seconds, r.fight_time_minutes,
  CASE WHEN r.weightclass ILIKE '%Title Bout%' THEN 1 ELSE 0 END AS is_title_bout,
  CASE WHEN r.weightclass ILIKE '%interim%' THEN 1 ELSE 0 END AS is_interim,
  CASE WHEN r.weightclass ILIKE '%tournament%' THEN 1 ELSE 0 END AS is_tournament
FROM stg_fight_results r LEFT JOIN stg_event_details e ON r.event = e.event
WHERE r.url IS NOT NULL AND r.url <> ''""",
    ),
    "dim_fighter": (
        f"""
fct_fights_v AS (
  SELECT r.url AS fight_id, r.fighter_1, r.fighter_2, r.winner
  FROM stg_fight_results r WHERE r.url IS NOT NULL AND r.url <> ''
)""",
        f"""
SELECT DISTINCT fighter_name,
  split_part(fighter_name, ' ', 1) AS first_name,
  {_last_word('fighter_name')} AS last_name
FROM (
  SELECT fighter_1 AS fighter_name FROM fct_fights_v
  UNION ALL SELECT fighter_2 FROM fct_fights_v
  UNION ALL SELECT winner FROM fct_fights_v
) WHERE fighter_name IS NOT NULL AND fighter_name <> ''""",
    ),
    "dim_event": (
        "",
        """
SELECT event AS event_name, event AS event_key, event_date, event_year, location, url
FROM stg_event_details WHERE event IS NOT NULL AND event <> ''""",
    ),
    "dim_division": (
        "",
        f"""
SELECT DISTINCT {_wc_norm('weightclass', strip_interim=True)} AS division_name
FROM stg_fight_results r
WHERE r.url IS NOT NULL AND r.url <> ''
  AND {_wc_norm('weightclass', strip_interim=True)} IS NOT NULL
  AND {_wc_norm('weightclass', strip_interim=True)} <> ''""",
    ),
    # ---- simple aggregate family ------------------------------------------
    "fighters_by_wins": (
        "",
        """
SELECT winner AS fighter, count(*) AS wins
FROM stg_fight_results
WHERE winner IS NOT NULL AND winner <> ''
GROUP BY winner ORDER BY wins DESC""",
    ),
    "fighters_by_ko_wins": _wins_by_method("'KO/TKO'", "ko_wins"),
    "fighters_by_submission_wins": _wins_by_method("'Submission'", "submission_wins"),
    "fighters_by_non_decision_wins": _wins_by_method(
        "'KO/TKO', 'Submission'", "non_decision_wins"
    ),
    "fight_time_per_division": (
        "",
        """
SELECT weightclass, count(*) AS fight_count,
  sum(fight_time_seconds)::DOUBLE / (count(*) * 60)::DOUBLE AS avg_fight_time_minutes,
  sum(fight_time_seconds)::DOUBLE / count(*)::DOUBLE AS avg_fight_time_seconds
FROM stg_fight_results
WHERE weightclass IS NOT NULL AND fight_time_minutes IS NOT NULL
GROUP BY weightclass
ORDER BY avg_fight_time_minutes DESC, fight_count DESC, weightclass""",
    ),
    "fightrers_by_avg_fight_time_min_5": (
        """
ft_rows AS (
  SELECT fighter_1 AS fighter, fight_time_seconds
  FROM stg_fight_results WHERE fight_time_minutes IS NOT NULL
  UNION ALL
  SELECT fighter_2, fight_time_seconds
  FROM stg_fight_results WHERE fight_time_minutes IS NOT NULL
)""",
        """
SELECT fighter, count(*) AS fight_count,
  sum(fight_time_seconds)::DOUBLE / (count(*) * 60)::DOUBLE AS avg_fight_time_minutes
FROM ft_rows WHERE fighter IS NOT NULL AND fighter <> ''
GROUP BY fighter
HAVING sum(fight_time_seconds)::DOUBLE / (count(*) * 60)::DOUBLE >= 5
ORDER BY avg_fight_time_minutes DESC, fight_count DESC""",
    ),
    "fighters_best_record": (
        """
record_rows AS (
  SELECT fighter_1 AS fighter, upper(outcome_1) AS outcome FROM stg_fight_results
  UNION ALL
  SELECT fighter_2, upper(outcome_2) FROM stg_fight_results
),
record_counts AS (
  SELECT fighter, count(*) AS total_fights,
    sum(CASE WHEN outcome = 'W' THEN 1 ELSE 0 END)::BIGINT AS wins,
    sum(CASE WHEN outcome = 'L' THEN 1 ELSE 0 END)::BIGINT AS losses,
    sum(CASE WHEN outcome NOT IN ('W', 'L') THEN 1 ELSE 0 END)::BIGINT AS nc
  FROM record_rows WHERE fighter IS NOT NULL AND fighter <> '' GROUP BY fighter
)""",
        """
SELECT fighter, wins, losses, nc, total_fights,
  CASE WHEN total_fights > 0 THEN wins::DOUBLE / total_fights END AS win_pct
FROM record_counts WHERE total_fights >= 10
ORDER BY win_pct DESC, wins DESC, losses ASC, fighter""",
    ),
    "clutch_wins": (
        """
cw_totals AS (
  SELECT fighter, count(*) AS total_fights FROM (
    SELECT fighter_1 AS fighter FROM stg_fight_results
    UNION ALL SELECT fighter_2 FROM stg_fight_results
  ) WHERE fighter IS NOT NULL AND fighter <> '' GROUP BY fighter
)""",
        """
SELECT r.winner AS fighter, count(*) AS clutch_wins
FROM stg_fight_results r JOIN cw_totals t ON r.winner = t.fighter
WHERE r.round_number >= 4 AND r.method_group IN ('KO/TKO', 'Submission')
  AND r.winner IS NOT NULL AND r.winner <> '' AND t.total_fights >= 10
GROUP BY r.winner ORDER BY clutch_wins DESC, fighter""",
    ),
    # ---- window family -----------------------------------------------------
    "fighters_by_longest_winning_streak": (
        f"""
streak_fights AS (
  SELECT r.url AS fight_id, r.event, r.bout, e.event_date,
    r.fighter_1, r.fighter_2, r.outcome_1, r.outcome_2
  FROM stg_fight_results r LEFT JOIN stg_event_details e ON r.event = e.event
  WHERE r.fighter_1 IS NOT NULL AND r.fighter_2 IS NOT NULL
),
streak_rows AS (
  SELECT fight_id, event, bout, event_date, fighter_1 AS fighter, upper(outcome_1) AS outcome
  FROM streak_fights
  UNION ALL
  SELECT fight_id, event, bout, event_date, fighter_2, upper(outcome_2) FROM streak_fights
),
streak_ordered AS (
  SELECT fighter, outcome,
    sum(CASE WHEN outcome = 'W' THEN 0 ELSE 1 END) OVER (
      PARTITION BY fighter ORDER BY {_FIGHT_ORDER}
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS loss_group
  FROM streak_rows WHERE fighter IS NOT NULL AND fighter <> ''
),
streaks AS (
  SELECT fighter, loss_group, count(*) AS streak_length
  FROM streak_ordered WHERE outcome = 'W' GROUP BY fighter, loss_group
)""",
        """
SELECT fighter, max(streak_length) AS longest_win_streak
FROM streaks GROUP BY fighter HAVING max(streak_length) >= 10
ORDER BY longest_win_streak DESC, fighter""",
    ),
    "dominant_style_per_division_year": (
        """
style_counts AS (
  SELECT r.weightclass, e.event_year, r.method_group, count(*) AS fight_count
  FROM stg_fight_results r JOIN stg_event_details e ON r.event = e.event
  WHERE r.weightclass IS NOT NULL AND r.method_group IS NOT NULL
    AND e.event_year IS NOT NULL
  GROUP BY 1, 2, 3
),
style_ranked AS (
  SELECT weightclass, event_year, method_group, fight_count,
    dense_rank() OVER (PARTITION BY weightclass, event_year
      ORDER BY fight_count DESC, method_group) AS style_rank
  FROM style_counts
)""",
        """
SELECT weightclass, event_year, method_group AS winning_method, fight_count
FROM style_ranked WHERE style_rank = 1
ORDER BY fight_count DESC, weightclass, event_year, winning_method""",
    ),
    "championship_rounds_fought": (
        f"""
crf_rows AS (
  SELECT fighter_1 AS fighter, round_number FROM stg_fight_results
  WHERE {_UND_TITLE_FILTER}
  UNION ALL
  SELECT fighter_2, round_number FROM stg_fight_results
  WHERE {_UND_TITLE_FILTER}
)""",
        """
SELECT fighter, count(*) AS title_fights,
  sum(CASE WHEN round_number = 4 THEN 1 WHEN round_number >= 5 THEN 2 ELSE 0 END)::BIGINT
    AS championship_rounds_fought
FROM crf_rows WHERE fighter IS NOT NULL AND fighter <> ''
GROUP BY fighter HAVING count(*) >= 5
ORDER BY championship_rounds_fought DESC, title_fights DESC, fighter""",
    ),
    "title_fight_results_by_fighter": (
        """
tfr_rows AS (
  SELECT fighter_1 AS fighter, weightclass AS category,
    CASE WHEN upper(outcome_1) = 'W' THEN 1 ELSE 0 END AS title_fight_win,
    CASE WHEN upper(outcome_1) = 'L' THEN 1 ELSE 0 END AS title_fight_loss
  FROM stg_fight_results WHERE weightclass ILIKE '%Title Bout%'
  UNION ALL
  SELECT fighter_2, weightclass,
    CASE WHEN upper(outcome_2) = 'W' THEN 1 ELSE 0 END,
    CASE WHEN upper(outcome_2) = 'L' THEN 1 ELSE 0 END
  FROM stg_fight_results WHERE weightclass ILIKE '%Title Bout%'
)""",
        """
SELECT fighter, category,
  sum(title_fight_win)::BIGINT AS title_fight_wins,
  sum(title_fight_loss)::BIGINT AS title_fight_losses
FROM tfr_rows WHERE fighter IS NOT NULL AND fighter <> ''
GROUP BY fighter, category
ORDER BY title_fight_wins DESC, title_fight_losses ASC, fighter""",
    ),
    "quality_of_opposition_faced": (
        f"""
qof_fights AS (
  SELECT r.url AS fight_id, r.event, r.bout, e.event_date,
    r.fighter_1, r.fighter_2, r.winner
  FROM stg_fight_results r JOIN stg_event_details e ON r.event = e.event
  WHERE r.winner IS NOT NULL AND r.winner <> ''
),
qof_rows AS (
  SELECT fight_id, event, bout, event_date, fighter_1 AS fighter, fighter_2 AS opponent,
    CASE WHEN winner = fighter_1 THEN 1 ELSE 0 END AS is_win
  FROM qof_fights
  UNION ALL
  SELECT fight_id, event, bout, event_date, fighter_2, fighter_1,
    CASE WHEN winner = fighter_2 THEN 1 ELSE 0 END
  FROM qof_fights
),
qof_records AS (
  SELECT fight_id, fighter, opponent,
    sum(is_win) OVER (PARTITION BY fighter ORDER BY {_FIGHT_ORDER}
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_wins,
    sum(CASE WHEN is_win = 1 THEN 0 ELSE 1 END) OVER (
      PARTITION BY fighter ORDER BY {_FIGHT_ORDER}
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_losses,
    sum(is_win) OVER (PARTITION BY fighter) AS career_wins
  FROM qof_rows
)""",
        """
SELECT a.fighter, count(*) AS fights, max(a.career_wins)::BIGINT AS wins,
  sum((CASE WHEN b.prior_wins + b.prior_losses > 0
        THEN b.prior_wins::DOUBLE / (b.prior_wins + b.prior_losses)
      END)::DECIMAL(18,10))::DOUBLE
    / count(CASE WHEN b.prior_wins + b.prior_losses > 0 THEN 1 END)::DOUBLE
    AS avg_opponent_win_pct_at_time,
  sum(b.career_wins)::DOUBLE / count(*)::DOUBLE AS avg_opponent_career_wins
FROM qof_records a
JOIN qof_records b ON a.fight_id = b.fight_id AND a.opponent = b.fighter
WHERE a.fighter IS NOT NULL AND a.fighter <> ''
GROUP BY a.fighter HAVING max(a.career_wins) >= 10
ORDER BY wins DESC, avg_opponent_win_pct_at_time DESC, avg_opponent_career_wins DESC, a.fighter""",
    ),
    "wins_over_champions": (
        f"""
woc_champions AS (
  SELECT r.winner AS champ, min(e.event_date) AS first_title_win_date
  FROM stg_fight_results r JOIN stg_event_details e ON r.event = e.event
  WHERE r.winner IS NOT NULL AND r.winner <> '' AND r.{_UND_TITLE_FILTER}
  GROUP BY r.winner
),
woc_fights AS (
  SELECT r.url AS fight_id, r.event, r.bout, r.weightclass, e.event_date,
    r.winner AS fighter,
    CASE WHEN r.winner = r.fighter_1 THEN r.fighter_2 ELSE r.fighter_1 END AS opponent
  FROM stg_fight_results r JOIN stg_event_details e ON r.event = e.event
  WHERE r.winner IS NOT NULL AND r.winner <> ''
)""",
        """
SELECT f.fighter, f.opponent, f.event_date, f.event, f.bout, f.weightclass
FROM woc_fights f JOIN woc_champions c
  ON c.champ = f.opponent AND c.first_title_win_date <= f.event_date
ORDER BY f.event_date DESC NULLS FIRST, f.fighter, f.opponent""",
    ),
    "wins_over_champions_agg": (
        f"""
woc_champions AS (
  SELECT r.winner AS champ, min(e.event_date) AS first_title_win_date
  FROM stg_fight_results r JOIN stg_event_details e ON r.event = e.event
  WHERE r.winner IS NOT NULL AND r.winner <> '' AND r.{_UND_TITLE_FILTER}
  GROUP BY r.winner
),
woc_fights AS (
  SELECT r.url AS fight_id, e.event_date, r.winner AS fighter,
    CASE WHEN r.winner = r.fighter_1 THEN r.fighter_2 ELSE r.fighter_1 END AS opponent
  FROM stg_fight_results r JOIN stg_event_details e ON r.event = e.event
  WHERE r.winner IS NOT NULL AND r.winner <> ''
),
woc AS (
  SELECT f.fighter, f.opponent
  FROM woc_fights f JOIN woc_champions c
    ON c.champ = f.opponent AND c.first_title_win_date <= f.event_date
)""",
        """
SELECT fighter, count(DISTINCT opponent) AS wins_over_champions
FROM woc WHERE fighter IS NOT NULL AND fighter <> ''
GROUP BY fighter ORDER BY wins_over_champions DESC, fighter""",
    ),
    "title_defenses": (
        f"""
td_wins AS (
  SELECT r.winner AS fighter,
    {_wc_norm('r.weightclass', strip_interim=False)} AS weight_category,
    e.event_date, r.url
  FROM stg_fight_results r JOIN stg_event_details e ON r.event = e.event
  WHERE r.winner IS NOT NULL AND r.winner <> '' AND r.{_UND_TITLE_FILTER}
),
td_ordered AS (
  SELECT fighter, weight_category,
    row_number() OVER (PARTITION BY fighter, weight_category
      ORDER BY event_date ASC NULLS LAST, url) AS title_win_number
  FROM td_wins WHERE weight_category IS NOT NULL AND weight_category <> ''
)""",
        """
SELECT fighter, weight_category,
  sum(CASE WHEN title_win_number > 1 THEN 1 ELSE 0 END)::BIGINT AS title_defenses
FROM td_ordered GROUP BY fighter, weight_category
HAVING sum(CASE WHEN title_win_number > 1 THEN 1 ELSE 0 END) > 0
ORDER BY weight_category, title_defenses DESC, fighter""",
    ),
    "consecutive_title_defenses": (
        f"""
ctd_fights AS (
  SELECT e.event_date,
    {_wc_norm('r.weightclass', strip_interim=False)} AS weight_category,
    r.fighter_1, r.fighter_2, r.outcome_1, r.outcome_2, r.url
  FROM stg_fight_results r JOIN stg_event_details e ON r.event = e.event
  WHERE r.{_UND_TITLE_FILTER} AND e.event_date IS NOT NULL
),
ctd_rows AS (
  SELECT fighter_1 AS fighter, weight_category, event_date,
    CASE WHEN upper(outcome_1) = 'W' THEN 'W' WHEN upper(outcome_1) = 'L' THEN 'L' END AS result,
    url
  FROM ctd_fights
  UNION ALL
  SELECT fighter_2, weight_category, event_date,
    CASE WHEN upper(outcome_2) = 'W' THEN 'W' WHEN upper(outcome_2) = 'L' THEN 'L' END,
    url
  FROM ctd_fights
),
ctd_ordered AS (
  SELECT fighter, weight_category, result,
    sum(CASE WHEN result = 'L' THEN 1 ELSE 0 END) OVER (
      PARTITION BY fighter, weight_category ORDER BY event_date, url
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS loss_group
  FROM ctd_rows
  WHERE fighter IS NOT NULL AND fighter <> ''
    AND weight_category IS NOT NULL AND weight_category <> ''
    AND result IN ('W', 'L')
),
ctd_streaks AS (
  SELECT fighter, weight_category, loss_group,
    count(*) FILTER (WHERE result = 'W') AS win_streak
  FROM ctd_ordered GROUP BY fighter, weight_category, loss_group
)""",
        """
SELECT fighter, weight_category,
  max(greatest(win_streak - 1, 0))::BIGINT AS max_consecutive_title_defenses
FROM ctd_streaks GROUP BY fighter, weight_category
HAVING max(greatest(win_streak - 1, 0)) >= 1
ORDER BY max_consecutive_title_defenses DESC, fighter, weight_category""",
    ),
    "title_fights": (
        _TITLE_FIGHTS_CTE,
        """
SELECT event, bout, weightclass, method, round_number, "time", time_format,
  winner, url, event_date, event_year, location
FROM title_fights_v
ORDER BY event_date DESC NULLS LAST, event, bout""",
    ),
    # ---- champion-lineage family -------------------------------------------
    "title_reigns": (_TITLE_REIGNS_CHAIN, _TITLE_REIGNS_SELECT),
    "fct_title_reigns": (
        _TITLE_REIGNS_CHAIN,
        """
SELECT weight_category, fighter, start_date, end_date, end_reason,
  (CASE WHEN end_date IS NULL THEN NULL ELSE (end_date - start_date) END)::BIGINT AS reign_days,
  CASE WHEN end_date IS NULL THEN 1 ELSE 0 END AS is_active
FROM title_reigns_out""",
    ),
    "total_champ_days": (
        _TITLE_REIGNS_CHAIN
        + f""",
tcd_base AS (
  SELECT weight_category, fighter, start_date,
    coalesce(end_date, DATE '{AS_OF_DATE}') AS effective_end_date
  FROM title_reigns_out WHERE start_date IS NOT NULL
)""",
        """
SELECT weight_category, fighter,
  sum(effective_end_date - start_date)::BIGINT AS total_champ_days
FROM tcd_base GROUP BY weight_category, fighter
ORDER BY total_champ_days DESC, weight_category, fighter""",
    ),
    "multi_division_champs": (
        _TITLE_FIGHTS_CTE
        + f""",
mdc_title_wins AS (
  SELECT winner AS fighter,
    {_wc_norm('weightclass', strip_interim=False)} AS weight_category,
    event_date
  FROM title_fights_v
  WHERE winner IS NOT NULL AND winner <> '' AND weightclass IS NOT NULL
    AND weightclass NOT ILIKE '%interim%' AND weightclass NOT ILIKE '%tournament%'
),
mdc_category_wins AS (
  SELECT fighter, weight_category, count(*) AS title_wins_in_category
  FROM mdc_title_wins
  WHERE weight_category IS NOT NULL AND weight_category <> ''
  GROUP BY fighter, weight_category
),
mdc_champ_counts AS (
  SELECT fighter, count(*) AS distinct_title_categories,
    sum(title_wins_in_category)::BIGINT AS total_title_wins
  FROM mdc_category_wins GROUP BY fighter
)""",
        """
SELECT fighter, distinct_title_categories, total_title_wins,
  CASE WHEN distinct_title_categories >= 3 THEN 'triple' ELSE 'double' END AS champ_type
FROM mdc_champ_counts WHERE distinct_title_categories >= 2
ORDER BY distinct_title_categories DESC, total_title_wins DESC, fighter""",
    ),
}


def oracle_for(name: str) -> str:
    """Full DuckDB statement for model ``name`` over the testdata views."""
    extra, final = MODEL_BODIES[name]
    ctes = synth_ctes().strip() + ",\n" + STAGING_CTES.strip()
    if extra.strip():
        ctes += ",\n" + extra.strip().lstrip(",").strip()
    return f"WITH {ctes}\n{final.strip()}"


def model_names() -> list[str]:
    return list(MODEL_BODIES)
