"""Literal raw-input fixture for the redskins-rule golden pipeline.

The reference repo commits no raw inputs — only the golden OUTPUT
(results/nfl_elec_results.parquet, 12 rows x 25 cols). These literals
are the minimal raw NFL-schedule and election-results rows (with every
quirk the reference's cleaning handles: ''-indexed CSV rows, away/home
row-order encoding, parenthetical team annotations, '--' unplayed
rows, postseason long-date rows, duplicate raw rows, comma-grouped
vote strings, a pre-1972 noise row, an exact tie game) from which
`pipelines.redskins_rule.run` reproduces the golden output exactly.

Used by workload q107_redskins_golden so reference parity is checked
by the DRIVER's cross-engine hash (against GOLDEN_ROWS as a literal
oracle table), not only by pytest.

Derived from tests/test_redskins_pipeline.py's fixture builders run
against /root/reference/results/nfl_elec_results.parquet; kept as
literals so the workload never reads the reference tree at runtime.
"""

GOLDEN_COLUMNS = ['elec_date', 'pres_winning_party', 'pres_winning_candidate', 'count_electoral_votes', 'count_popular_votes', 'pop_winning_candidate', 'pop_winning_party', 'electoral_rank_desc', 'popular_rank_desc', 'challenger_pres_party', 'incumbent_pres_party', 'pop_incumbent_party', 'pop_incumbent_elec_result', 'game_date', 'team', 'final_score', 'home_team_rnk', 'winning_team', 'winning_team_score', 'redskins_result', 'date_diff', 'diff_rank_asc', 'p_elec_date', 'prediction', 'prediction_results']

NFL_ROWS = [
    ('0', 1976, '10/31', 'Dallas(10-4)', '20'),
    ('1', 1976, '10/31', 'Washington', '7'),
    ('2', 1980, '11/2', 'Minnesota', '39'),
    ('3', 1980, '11/2', 'Washington', '14'),
    ('4', 1984, '11/5', 'Foe1984', '20'),
    ('5', 1984, '11/5', 'Washington', '27'),
    ('6', 1988, '11/6', 'Foe1988', '27'),
    ('7', 1988, '11/6', 'Washington', '27'),
    ('8', 1992, '11/1', 'NY Giants', '24'),
    ('9', 1992, '11/1', 'Washington', '7'),
    ('10', 1996, '10/27', 'Foe1996', '24'),
    ('11', 1996, '10/27', 'Washington', '31'),
    ('12', 2000, '10/30', 'Tennessee', '27'),
    ('13', 2000, '10/30', 'Washington', '21'),
    ('14', 2004, '10/31', 'Green Bay', '28'),
    ('15', 2004, '10/31', 'Washington', '14'),
    ('16', 2008, '11/3', 'Pittsburgh', '23'),
    ('17', 2008, '11/3', 'Washington', '6'),
    ('18', 2012, '11/4', 'Carolina', '21'),
    ('19', 2012, '11/4', 'Washington', '13'),
    ('20', 2016, '10/16', 'Foe2016', '20'),
    ('21', 2016, '10/16', 'Washington', '27'),
    ('22', 2020, '10/25', 'Foe2020', '18'),
    ('23', 2020, '10/25', 'Washington', '25'),
    ('24', 1976, '10/13', 'Jets', '10'),
    ('25', 1976, '10/13', 'Washington', '30'),
    ('26', 1980, '10/26', 'Washington', '21'),
    ('27', 1980, '10/26', 'Buffalo', '3'),
    ('28', 1982, '1/22/1983 4:00PM', 'Washington', '31'),
    ('29', 1976, '12/12', 'Washington', '--'),
    ('0', 1976, '10/31', 'Dallas(10-4)', '20'),
]

ELEC_ROWS = [
    (0, '1968', 'Richard M. Nixon', 'Republican', 301, '31,783,783', '0.0'),
    (1, '1972', 'Richard M. Nixon', 'Republican', 520, '47,168,710', '60.7'),
    (2, '1972', 'George McGovern', 'Democratic', 17, '29,173,222', '37.5'),
    (3, '1976', 'Jimmy Carter', 'Democratic', 297, '40,825,839', '0.0'),
    (4, '1976', 'Republican Challenger 1976', 'Republican', 197, '39,825,839', '0.0'),
    (5, '1980', 'Ronald W. Reagan', 'Republican', 489, '43,642,639', '0.0'),
    (6, '1980', 'Democratic Challenger 1980', 'Democratic', 389, '42,642,639', '0.0'),
    (7, '1984', 'Ronald W. Reagan', 'Republican', 525, '54,455,075', '0.0'),
    (8, '1984', 'Democratic Challenger 1984', 'Democratic', 425, '53,455,075', '0.0'),
    (9, '1988', 'George H.W. Bush', 'Republican', 426, '48,886,097', '0.0'),
    (10, '1988', 'Democratic Challenger 1988', 'Democratic', 326, '47,886,097', '0.0'),
    (11, '1992', 'Bill Clinton', 'Democratic', 370, '44,909,889', '0.0'),
    (12, '1992', 'Republican Challenger 1992', 'Republican', 270, '43,909,889', '0.0'),
    (13, '1996', 'Bill Clinton', 'Democratic', 379, '47,402,357', '0.0'),
    (14, '1996', 'Republican Challenger 1996', 'Republican', 279, '46,402,357', '0.0'),
    (15, '2000', 'George W. Bush', 'Republican', 271, '50,456,002', '0.0'),
    (16, '2000', 'Al Gore', 'Democratic', 171, '50,996,582', '0.0'),
    (17, '2004', 'George W. Bush', 'Republican', 286, '62,028,285', '0.0'),
    (18, '2004', 'Democratic Challenger 2004', 'Democratic', 186, '61,028,285', '0.0'),
    (19, '2008', 'Barack Obama', 'Democratic', 365, '69,456,000', '0.0'),
    (20, '2008', 'Republican Challenger 2008', 'Republican', 265, '68,456,000', '0.0'),
    (21, '2012', 'Barack Obama', 'Democratic', 332, '65,446,032', '0.0'),
    (22, '2012', 'Republican Challenger 2012', 'Republican', 232, '64,446,032', '0.0'),
    (23, '2016', 'Minor Candidate 2016', 'Libertarian', 0, '4,489,235', '0.0'),
    (24, '2016', 'Hillary Clinton', 'Democratic', 204, '65,853,514', '0.0'),
    (25, '2016', 'Donald Trump', 'Republican', 304, '62,979,636', '0.0'),
    (26, '2020', 'Joe Biden', 'Democratic', 306, '81,268,924', '0.0'),
    (27, '2020', 'Republican Challenger 2020', 'Republican', 206, '80,268,924', '0.0'),
]

GOLDEN_ROWS = [
    ('1976-11-02', 'Democratic', 'Jimmy Carter', 297, 40825839, 'Jimmy Carter', 'Democratic', 1, 1, 'Democratic', 'Republican', 'Republican', 'LOSE', '1976-10-31', 'Washington', 7, 2, 'Dallas', 20, 'LOSE', 2, 1, '1976-11-02', 'Democratic', True),
    ('1980-11-04', 'Republican', 'Ronald W. Reagan', 489, 43642639, 'Ronald W. Reagan', 'Republican', 1, 1, 'Republican', 'Democratic', 'Democratic', 'LOSE', '1980-11-02', 'Washington', 14, 2, 'Minnesota', 39, 'LOSE', 2, 1, '1980-11-04', 'Republican', True),
    ('1984-11-06', 'Republican', 'Ronald W. Reagan', 525, 54455075, 'Ronald W. Reagan', 'Republican', 1, 1, 'Democratic', 'Republican', 'Republican', 'WIN', '1984-11-05', 'Washington', 27, 2, 'Washington', 27, 'WIN', 1, 1, '1984-11-06', 'Republican', True),
    ('1988-11-08', 'Republican', 'George H.W. Bush', 426, 48886097, 'George H.W. Bush', 'Republican', 1, 1, 'Democratic', 'Republican', 'Republican', 'WIN', '1988-11-06', 'Washington', 27, 2, 'Washington', 27, 'WIN', 2, 1, '1988-11-08', 'Republican', True),
    ('1992-11-03', 'Democratic', 'Bill Clinton', 370, 44909889, 'Bill Clinton', 'Democratic', 1, 1, 'Democratic', 'Republican', 'Republican', 'LOSE', '1992-11-01', 'Washington', 7, 2, 'NY Giants', 24, 'LOSE', 2, 1, '1992-11-03', 'Democratic', True),
    ('1996-11-05', 'Democratic', 'Bill Clinton', 379, 47402357, 'Bill Clinton', 'Democratic', 1, 1, 'Republican', 'Democratic', 'Democratic', 'WIN', '1996-10-27', 'Washington', 31, 2, 'Washington', 31, 'WIN', 9, 1, '1996-11-05', 'Democratic', True),
    ('2000-11-07', 'Republican', 'George W. Bush', 271, 50456002, 'Al Gore', 'Democratic', 1, 2, 'Republican', 'Democratic', 'Democratic', 'LOSE', '2000-10-30', 'Washington', 21, 2, 'Tennessee', 27, 'LOSE', 8, 1, '2000-11-07', 'Republican', True),
    ('2004-11-02', 'Republican', 'George W. Bush', 286, 62028285, 'George W. Bush', 'Republican', 1, 1, 'Democratic', 'Republican', 'Democratic', 'LOSE', '2004-10-31', 'Washington', 14, 2, 'Green Bay', 28, 'LOSE', 2, 1, '2004-11-02', 'Republican', True),
    ('2008-11-04', 'Democratic', 'Barack Obama', 365, 69456000, 'Barack Obama', 'Democratic', 1, 1, 'Democratic', 'Republican', 'Republican', 'LOSE', '2008-11-03', 'Washington', 6, 2, 'Pittsburgh', 23, 'LOSE', 1, 1, '2008-11-04', 'Democratic', True),
    ('2012-11-06', 'Democratic', 'Barack Obama', 332, 65446032, 'Barack Obama', 'Democratic', 1, 1, 'Republican', 'Democratic', 'Democratic', 'WIN', '2012-11-04', 'Washington', 13, 2, 'Carolina', 21, 'LOSE', 2, 1, '2012-11-06', 'Republican', False),
    ('2016-11-08', 'Republican', 'Donald Trump', 304, 62979636, 'Hillary Clinton', 'Democratic', 1, 2, 'Democratic', 'Democratic', 'Democratic', 'LOSE', '2016-10-16', 'Washington', 27, 2, 'Washington', 27, 'WIN', 23, 1, '2016-11-08', 'Democratic', False),
    ('2020-11-03', 'Democratic', 'Joe Biden', 306, 81268924, 'Joe Biden', 'Democratic', 1, 1, 'Democratic', 'Republican', 'Democratic', 'WIN', '2020-10-25', 'Washington', 25, 2, 'Washington', 25, 'WIN', 9, 1, '2020-11-03', 'Democratic', True),
]
