"""The reference README's full session (/root/reference/README.md:43-78)
running unchanged on emdrive-spark — the 'switch engines, keep your
queries' demonstration.

Run: python examples/readme_session.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emdrive_spark.engine import Engine
from emdrive_spark.session import get_spark


def main() -> None:
    spark = get_spark("emdrive-example")
    eng = Engine(spark)

    # 1. DDL — emdrive dialect: typed columns, non-nullable by default,
    #    METRIC KEY, STRING(n), DEFAULT NOW()
    eng.execute(
        """
        CREATE TABLE IF NOT EXISTS photos_seen (
            hash UINT8 METRIC KEY USING mtree(hamming),
            url STRING(2048) PRIMARY KEY,
            width UINT32,
            height UINT32,
            seen_at TIMESTAMP DEFAULT NOW()
        )
        """
    )

    # 2. DML — defaults injected, PK uniqueness enforced
    eng.execute(
        """
        INSERT INTO photos_seen (hash, url, width, height)
        VALUES (0b11001111, 'https://twixes.com/a.png', 1280, 820),
               (0b00001011, 'https://twixes.com/b.png', 640, 480),
               (0b11111111, 'https://twixes.com/c.png', 1, 1)
        """
    )

    # 3. The README flagship: metric distance with an alias filter
    flagship = eng.execute(
        "SELECT url, hash @ 0b00001011 AS distance "
        "FROM photos_seen WHERE distance < 4"
    )
    print("flagship (hash @ q < 4):")
    flagship.show(truncate=False)

    # 4. Anything beyond the dialect falls through to full Spark SQL on
    #    the same tables
    ansi = eng.execute(
        "SELECT count(*) AS n, min(width) AS min_w, max(height) AS max_h "
        "FROM photos_seen"
    )
    print("ANSI passthrough:")
    ansi.show()

    spark.stop()


if __name__ == "__main__":
    main()
