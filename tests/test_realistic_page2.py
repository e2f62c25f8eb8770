"""Second realism spot-check: e-commerce product page — description kept,
price grid / review widget / breadcrumbs / related-products rail dropped."""

from lightly_ocr_spark.functions.extract import extract_text

PRODUCT = """<html><head><title>Widget Pro 3000 | ShopEx</title></head><body>
<nav><a href="/">Home</a> &gt; <a href="/tools">Tools</a> &gt; Widget Pro</nav>
<div class="buybox">
  <span class="price">$49.99</span>
  <button>Add to cart</button>
  <a href="/wishlist">Wishlist</a>
</div>
<h2>Product description</h2>
<p>The Widget Pro 3000 combines a reinforced aluminium body with a
sealed drive unit, which keeps fine dust away from the gearing even
on long outdoor jobs in wet weather.</p>
<p>Every unit ships with two interchangeable heads, a quick release
collar, and a carrying case sized to fit under a standard van seat,
so crews can move between sites without repacking their kit.</p>
<table class="specs"><tr><th>Weight</th><td>1.2 kg</td></tr>
<tr><th>Torque</th><td>45 Nm</td></tr></table>
<div class="reviews">
  <h3>Reviews</h3>
  <div><a href="/u/1">bob77</a> ★★★★☆</div>
  <div><a href="/u/2">ann_k</a> ★★★★★</div>
</div>
<div class="related">
  <a href="/p/1">Widget Mini</a><a href="/p/2">Widget Max</a>
  <a href="/p/3">Spare heads</a>
</div>
<footer><a href="/terms">Terms</a> <a href="/privacy">Privacy</a></footer>
</body></html>"""


def test_product_description_extracted_chrome_dropped():
    r = extract_text(PRODUCT.encode())
    text = r.text
    assert "reinforced aluminium body" in text
    assert "carrying case" in text
    for chrome in ["$49.99", "Add to cart", "Wishlist", "bob77", "★",
                   "Widget Mini", "Terms", "1.2 kg", "ShopEx"]:
        assert chrome not in text, chrome
    # the two description paragraphs form one contiguous segment
    assert len(r.spans) == 1
