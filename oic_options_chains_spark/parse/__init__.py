"""Raw-zone parsers: era dispatch + the HTML volatility kernel (X1)."""
