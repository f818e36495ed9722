from __future__ import annotations

from types import SimpleNamespace

from esmarc_ray.dateparse import parse_date_data


class DateDataParser:
    def get_date_data(self, text):
        parsed, period = parse_date_data(text)
        return SimpleNamespace(date_obj=parsed, period=period or "day")
