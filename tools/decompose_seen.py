"""One-off diagnostic: stepwise timing of the crawl round's seen-commit
pipeline at a given parallelism/snapshot size. Usage:
    taskset -c 0-N-1 python tools/decompose_seen.py <cpus> <pages>
"""

import sys
import time

sys.path.insert(0, "/root/repo")

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
PAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 4_800_000


def main():
    import os

    os.environ.setdefault("SPARK_DRIVER_MEM", "96g")
    import pandas as pd
    from pyspark.sql import functions as F

    from politics_crawler_spark.functions.dates import is_today, parse_list_date
    from politics_crawler_spark.functions.numbers import parse_views
    from politics_crawler_spark.functions.urls import (
        canonical_url,
        is_valid_post_url,
        url_hash,
    )
    from politics_crawler_spark.operators.listparse import parse_list_pages
    from politics_crawler_spark.plans import seen as seen_mod
    from politics_crawler_spark.session import get_spark
    from politics_crawler_spark.sources.synthetic_pages import (
        crawl_boards,
        list_url,
        synthesize_pages,
    )

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    replicas = max(1, round(PAGES / (19 * 2800)))
    boards = crawl_boards(replicas)
    pages = synthesize_pages(spark, PAGES, replicas=replicas, partitions=CPUS * 2).persist()
    pages.count()
    pages_slim = pages.select("url", "html", "warc_ts")

    def tm(label, fn):
        t0 = time.time()
        r = fn()
        print(f"cpus={CPUS} {label} {time.time() - t0:.2f}", flush=True)
        return r

    all_urls = [(list_url(b, p),) for b in boards for p in range(b.max_pages)]
    lists_pool = pages_slim.join(
        F.broadcast(spark.createDataFrame(all_urls, "url string")),
        on="url", how="left_semi",
    ).persist()
    tm("pool", lambda: lists_pool.count())

    rows = []
    for b in boards:
        for p in range(b.max_pages):
            rows.append(dict(
                url=list_url(b, p), board=b.board, community=b.community,
                site=b.site, host=b.host, encoding=b.encoding,
                min_views=b.min_views, site_rank=b.site_rank, page_no=p,
            ))
    frontier = spark.createDataFrame(pd.DataFrame(rows))
    lists = F.broadcast(frontier).join(lists_pool, on="url", how="inner")
    cand = (
        parse_list_pages(lists.drop("warc_ts"))
        .filter(~F.col("is_notice"))
        .withColumn("link", canonical_url(F.col("url"), F.col("href")))
        .filter(is_valid_post_url(F.col("link")))
        .withColumn("date", parse_list_date(F.col("date_txt"), F.col("date_attr"), "2025-03-12"))
        .withColumn("views", parse_views(F.col("views_txt")))
        .withColumn("today", is_today(F.col("date"), "2025-03-12"))
    ).persist()
    n = tm("cand_mat(parse)", lambda: cand.count())
    print("cand rows", n, flush=True)

    selected = (
        cand.filter(F.col("today") & (F.col("views") >= F.col("min_views")))
        .withColumn("url_hash", url_hash(F.col("link")))
        .dropDuplicates(["url_hash"])
    ).persist()
    n = tm("selected_mat(dropdup)", lambda: selected.count())
    print("selected rows", n, flush=True)

    seen0 = seen_mod.empty_seen(spark, 16).localCheckpoint(eager=True)
    unseen = seen_mod.filter_unseen(selected, seen0, 16).persist()
    tm("probe_semi_mat", lambda: unseen.count())
    tm("fold_ckpt", lambda: seen_mod.update_seen(
        seen0, unseen.select("url_hash"), 16).localCheckpoint(eager=True).count())


if __name__ == "__main__":
    main()
