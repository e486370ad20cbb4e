"""KPI report chart — the reference notebook's visualization layer.

The reference renders an annotated matplotlib bar chart of the three
average-duration KPIs with a total-packages info box and a date-coverage
subtitle (``/root/reference/notebooks/report.ipynb`` cell 8: bars for
Avg Delivery/Lifecycle/Pickup Days, per-bar value labels, "Total
Packages" text box, "Data covers: ..." fig.text). This module
reproduces that figure from the KPI row :func:`plans.parcel.kpi_report`
/ ``plans.parcel_run.run_parcel_etl`` produce.

matplotlib is an OPTIONAL dependency (not installed in the build
sandbox): when present, ``render_kpi_chart`` emits the reference-style
PNG; when absent, a dependency-free SVG twin with the same elements is
written instead, so the report layer stays exercisable end-to-end.
Chart rendering is driver-side by construction — the input is one
4-field KPI row, never row-scale data.
"""

from __future__ import annotations

_BAR_KEYS = (
    ("avg_delivery_days", "Avg Delivery Days", "#1f77b4"),
    ("avg_lifecycle_days", "Avg Lifecycle Days", "#ff7f0e"),
    ("avg_pickup_days", "Avg Pickup Days", "#2ca02c"),
)
_TITLE = "Average Delivery KPI's"


def render_kpi_chart(
    kpi: dict,
    out_path: str,
    coverage: str | None = None,
    title: str = _TITLE,
) -> str:
    """Render the KPI dict to ``out_path`` (.png via matplotlib when
    installed, .svg always available). Returns the path written.

    ``kpi`` needs keys avg_delivery_days / avg_lifecycle_days /
    avg_pickup_days / total_packages (the kpi_report row as a dict);
    ``coverage`` is the optional "Data covers: ..." subtitle line the
    reference builds from the fact table's date bounds.
    """
    if out_path.endswith(".svg"):
        return _render_svg(kpi, out_path, coverage, title)
    try:
        import matplotlib  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "matplotlib is not installed: render_kpi_chart can only "
            "write .svg here — pass an .svg out_path or install "
            "matplotlib for PNG output"
        ) from e
    return _render_matplotlib(kpi, out_path, coverage, title)


def _render_matplotlib(
    kpi: dict, out_path: str, coverage: str | None, title: str
) -> str:
    """The reference's figure, verbatim layout (report.ipynb cell 8):
    8x7 bar chart, bold suptitle, coverage fig.text, per-bar value
    annotations, rounded total-packages box."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = [lab for _, lab, _ in _BAR_KEYS]
    values = [float(kpi[k] or 0.0) for k, _, _ in _BAR_KEYS]
    colors = [c for _, _, c in _BAR_KEYS]
    fig, ax = plt.subplots(figsize=(8, 7))
    bars = ax.bar(labels, values, color=colors)
    fig.suptitle(title, fontsize=16, fontweight="bold", y=1.03)
    if coverage:
        fig.text(0.5, 0.95, coverage, ha="center", fontsize=10)
    ax.set_ylabel("Days")
    for bar in bars:
        h = bar.get_height()
        ax.annotate(
            f"{h:.2f}",
            xy=(bar.get_x() + bar.get_width() / 2, h),
            xytext=(0, 5),
            textcoords="offset points",
            ha="center",
            va="bottom",
            fontsize=10,
            fontweight="bold",
        )
    ax.text(
        2.8,
        max(values or [1.0]) * 0.95,
        f"Total Packages:\n{int(kpi.get('total_packages', 0)):,}",
        fontsize=12,
        fontweight="bold",
        ha="left",
        va="top",
        bbox=dict(facecolor="white", alpha=0.7, boxstyle="round,pad=0.5"),
    )
    fig.tight_layout(rect=[0, 0, 1, 0.9])
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path


def _render_svg(
    kpi: dict, out_path: str, coverage: str | None, title: str
) -> str:
    """Dependency-free SVG with the same elements: title, coverage
    subtitle, three value-annotated bars, total-packages box."""
    W, H = 640, 560
    plot_l, plot_r, plot_t, plot_b = 70, 610, 90, 500
    values = [float(kpi[k] or 0.0) for k, _, _ in _BAR_KEYS]
    vmax = max(values + [1.0])
    bar_w = (plot_r - plot_l) / len(values) * 0.6
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
        f'viewBox="0 0 {W} {H}">',
        f'<rect width="{W}" height="{H}" fill="white"/>',
        f'<text x="{W / 2}" y="30" text-anchor="middle" font-size="18" '
        f'font-weight="bold">{title}</text>',
    ]
    if coverage:
        parts.append(
            f'<text x="{W / 2}" y="52" text-anchor="middle" '
            f'font-size="11">{coverage}</text>'
        )
    parts.append(
        f'<text x="18" y="{(plot_t + plot_b) / 2}" font-size="12" '
        f'transform="rotate(-90 18 {(plot_t + plot_b) / 2})" '
        f'text-anchor="middle">Days</text>'
    )
    for i, ((_, label, color), v) in enumerate(zip(_BAR_KEYS, values)):
        cx = plot_l + (plot_r - plot_l) * (i + 0.5) / len(values)
        h = (plot_b - plot_t) * (v / vmax)
        x, y = cx - bar_w / 2, plot_b - h
        parts.append(
            f'<rect class="kpi-bar" x="{x:.1f}" y="{y:.1f}" '
            f'width="{bar_w:.1f}" height="{h:.1f}" fill="{color}"/>'
        )
        parts.append(
            f'<text x="{cx:.1f}" y="{y - 6:.1f}" text-anchor="middle" '
            f'font-size="11" font-weight="bold">{v:.2f}</text>'
        )
        parts.append(
            f'<text x="{cx:.1f}" y="{plot_b + 18}" text-anchor="middle" '
            f'font-size="11">{label}</text>'
        )
    total = int(kpi.get("total_packages", 0))
    parts.append(
        f'<rect x="{plot_r - 150}" y="{plot_t}" width="140" height="44" '
        f'rx="8" fill="white" stroke="#888" opacity="0.85"/>'
    )
    parts.append(
        f'<text x="{plot_r - 80}" y="{plot_t + 18}" text-anchor="middle" '
        f'font-size="12" font-weight="bold">Total Packages:</text>'
    )
    parts.append(
        f'<text x="{plot_r - 80}" y="{plot_t + 36}" text-anchor="middle" '
        f'font-size="12" font-weight="bold">{total:,}</text>'
    )
    parts.append("</svg>")
    with open(out_path, "w") as f:
        f.write("\n".join(parts))
    return out_path


def coverage_line(fact) -> str:
    """The reference's "Data covers" subtitle from the fact table's
    entry/event date bounds (report.ipynb cell 8) — one 4-column agg."""
    from pyspark.sql import functions as F

    b = fact.agg(
        F.min("entry_date").alias("min_entry"),
        F.max("entry_date").alias("max_entry"),
        F.min("event_date").alias("min_event"),
        F.max("event_date").alias("max_event"),
    ).collect()[0]

    def d(x):
        return x.date() if hasattr(x, "date") else x

    return (
        "Data covers: "
        f"Entry Dates: {d(b['min_entry'])} → {d(b['max_entry'])} | "
        f"Event Dates: {d(b['min_event'])} → {d(b['max_event'])}"
    )
