"""Canonical company/security registry + topic ontology (authored fixtures).

The registry plays the role of the reference's entity registry + LanceDB
vector store (vanna_kg/ingestion/resolution/entity_registry.py): a canonical
target for entity linking. The ontology mirrors the *shape* of the
reference's curated topic gazetteer (vanna_kg/data/topics/financial_topics.json:
uri/label/definition/synonyms, 232 entries) with original content.

Merge-rule traps from the reference's dedup prompts are preserved as data
(entity_dedup.py:137-165): ticker==company, abbreviation==org, name variants
merge; subsidiaries stay DISTINCT (AWS != Amazon, YouTube != Google,
person != their company, product != maker).

Entity types follow the reference enum (types/entities.py:26-39):
company | person | organization | location | product | concept.
"""

from __future__ import annotations

# (canonical_name, entity_type, ticker_or_None, [aliases], definition)
_R = [
    # --- mega-cap companies (AAPL is the designated hot-skew entity) ---
    ("Apple Inc.", "company", "AAPL", ["Apple", "AAPL"], "Consumer electronics and services company headquartered in Cupertino"),
    ("Microsoft Corporation", "company", "MSFT", ["Microsoft", "MSFT"], "Software and cloud computing company headquartered in Redmond"),
    ("Alphabet Inc.", "company", "GOOGL", ["Alphabet", "GOOGL", "GOOG"], "Holding company and parent of Google"),
    ("Google LLC", "company", None, ["Google"], "Internet search and advertising company, subsidiary of Alphabet"),
    ("YouTube LLC", "company", None, ["YouTube"], "Online video platform, subsidiary of Google"),
    ("Amazon.com Inc.", "company", "AMZN", ["Amazon", "AMZN"], "E-commerce and cloud conglomerate headquartered in Seattle"),
    ("Amazon Web Services", "company", None, ["AWS"], "Cloud infrastructure provider, subsidiary of Amazon"),
    ("Meta Platforms Inc.", "company", "META", ["Meta", "META", "Facebook Inc."], "Social media company operating Facebook and Instagram"),
    ("NVIDIA Corporation", "company", "NVDA", ["NVIDIA", "Nvidia", "NVDA"], "Designer of graphics processors and AI accelerators"),
    ("Tesla Inc.", "company", "TSLA", ["Tesla", "TSLA"], "Electric vehicle and energy storage manufacturer"),
    ("Netflix Inc.", "company", "NFLX", ["Netflix", "NFLX"], "Subscription video streaming company"),
    ("Intel Corporation", "company", "INTC", ["Intel", "INTC"], "Semiconductor designer and manufacturer"),
    ("Advanced Micro Devices", "company", "AMD", ["AMD"], "Semiconductor company designing CPUs and GPUs"),
    ("Qualcomm Incorporated", "company", "QCOM", ["Qualcomm", "QCOM"], "Wireless technology and chipset company"),
    ("Broadcom Inc.", "company", "AVGO", ["Broadcom", "AVGO"], "Semiconductor and infrastructure software company"),
    ("Oracle Corporation", "company", "ORCL", ["Oracle", "ORCL"], "Database software and cloud company"),
    ("Salesforce Inc.", "company", "CRM", ["Salesforce", "CRM"], "Customer relationship management software company"),
    ("Adobe Inc.", "company", "ADBE", ["Adobe", "ADBE"], "Creative and document software company"),
    ("International Business Machines", "company", "IBM", ["IBM"], "Enterprise technology and consulting company"),
    ("Cisco Systems Inc.", "company", "CSCO", ["Cisco", "CSCO"], "Networking hardware and software company"),
    # --- banks / financials ---
    ("JPMorgan Chase & Co.", "company", "JPM", ["JPMorgan", "JPMorgan Chase", "JPM"], "Largest US bank by assets, headquartered in New York"),
    ("Bank of America Corporation", "company", "BAC", ["Bank of America", "BAC", "BofA"], "US consumer and investment bank headquartered in Charlotte"),
    ("Goldman Sachs Group", "company", "GS", ["Goldman Sachs", "Goldman", "GS"], "Global investment bank headquartered in New York"),
    ("Morgan Stanley", "company", "MS", ["MS"], "Global investment bank and wealth manager"),
    ("Wells Fargo & Company", "company", "WFC", ["Wells Fargo", "WFC"], "US bank headquartered in San Francisco"),
    ("Citigroup Inc.", "company", "C", ["Citigroup", "Citi"], "Global bank headquartered in New York"),
    ("BlackRock Inc.", "company", "BLK", ["BlackRock", "BLK"], "Largest asset manager in the world"),
    ("The Vanguard Group", "company", None, ["Vanguard"], "Investment management company known for index funds"),
    ("Berkshire Hathaway Inc.", "company", "BRK.A", ["Berkshire Hathaway", "Berkshire"], "Conglomerate holding company led from Omaha"),
    ("Visa Inc.", "company", "V", ["Visa"], "Payments network company"),
    ("Mastercard Incorporated", "company", "MA", ["Mastercard"], "Payments network company"),
    ("PayPal Holdings", "company", "PYPL", ["PayPal", "PYPL"], "Digital payments platform company"),
    ("American Express Company", "company", "AXP", ["American Express", "Amex", "AXP"], "Charge card and payments company"),
    ("Charles Schwab Corporation", "company", "SCHW", ["Charles Schwab", "Schwab"], "Brokerage and wealth management firm"),
    ("State Street Corporation", "company", "STT", ["State Street"], "Custodian bank and asset manager"),
    ("Fidelity Investments", "company", None, ["Fidelity"], "Privately held asset manager and brokerage"),
    ("UBS Group AG", "company", "UBS", ["UBS"], "Swiss global bank and wealth manager"),
    ("Deutsche Bank AG", "company", "DB", ["Deutsche Bank"], "German global investment bank"),
    ("Barclays PLC", "company", "BCS", ["Barclays"], "British universal bank"),
    ("HSBC Holdings plc", "company", "HSBC", ["HSBC"], "British multinational bank"),
    ("Credit Agricole SA", "company", None, ["Credit Agricole", "Crédit Agricole"], "French cooperative banking group"),
    ("BNP Paribas SA", "company", None, ["BNP Paribas", "BNP"], "French international banking group"),
    # --- industrials / energy / consumer ---
    ("Exxon Mobil Corporation", "company", "XOM", ["Exxon", "ExxonMobil", "XOM"], "Oil and gas supermajor headquartered in Texas"),
    ("Chevron Corporation", "company", "CVX", ["Chevron", "CVX"], "US oil and gas supermajor"),
    ("Shell plc", "company", "SHEL", ["Shell", "Royal Dutch Shell"], "British oil and gas supermajor"),
    ("BP p.l.c.", "company", "BP", ["BP"], "British oil and gas company"),
    ("The Boeing Company", "company", "BA", ["Boeing", "BA"], "Aerospace manufacturer of commercial and defense aircraft"),
    ("Airbus SE", "company", None, ["Airbus"], "European aerospace manufacturer"),
    ("General Motors Company", "company", "GM", ["General Motors", "GM"], "US automobile manufacturer headquartered in Detroit"),
    ("Ford Motor Company", "company", "F", ["Ford"], "US automobile manufacturer headquartered in Dearborn"),
    ("Toyota Motor Corporation", "company", "TM", ["Toyota"], "Japanese automobile manufacturer"),
    ("Caterpillar Inc.", "company", "CAT", ["Caterpillar", "CAT"], "Construction and mining equipment manufacturer"),
    ("General Electric Company", "company", "GE", ["General Electric", "GE"], "Industrial conglomerate focused on aerospace and energy"),
    ("Honeywell International", "company", "HON", ["Honeywell"], "Industrial conglomerate in automation and aerospace"),
    ("3M Company", "company", "MMM", ["3M"], "Diversified industrial manufacturer"),
    ("The Walt Disney Company", "company", "DIS", ["Disney", "Walt Disney"], "Entertainment and media conglomerate"),
    ("Walmart Inc.", "company", "WMT", ["Walmart", "WMT"], "Largest retailer in the world by revenue"),
    ("Costco Wholesale Corporation", "company", "COST", ["Costco", "COST"], "Membership warehouse retailer"),
    ("The Home Depot", "company", "HD", ["Home Depot"], "Home improvement retailer"),
    ("Target Corporation", "company", "TGT", ["Target"], "US general merchandise retailer"),
    ("McDonald's Corporation", "company", "MCD", ["McDonald's", "McDonalds"], "Global fast food restaurant chain"),
    ("Starbucks Corporation", "company", "SBUX", ["Starbucks", "SBUX"], "Global coffeehouse chain"),
    ("The Coca-Cola Company", "company", "KO", ["Coca-Cola", "Coke"], "Beverage company headquartered in Atlanta"),
    ("PepsiCo Inc.", "company", "PEP", ["PepsiCo", "Pepsi"], "Food and beverage conglomerate"),
    ("Procter & Gamble Company", "company", "PG", ["Procter & Gamble", "P&G"], "Consumer goods manufacturer"),
    ("Johnson & Johnson", "company", "JNJ", ["J&J", "JNJ"], "Pharmaceutical and consumer health company"),
    ("Pfizer Inc.", "company", "PFE", ["Pfizer", "PFE"], "Pharmaceutical company headquartered in New York"),
    ("Moderna Inc.", "company", "MRNA", ["Moderna", "MRNA"], "Biotechnology company focused on mRNA therapeutics"),
    ("UnitedHealth Group", "company", "UNH", ["UnitedHealth", "UNH"], "Managed healthcare and insurance company"),
    ("Delta Air Lines", "company", "DAL", ["Delta", "DAL"], "US passenger airline based in Atlanta"),
    ("United Airlines Holdings", "company", "UAL", ["United Airlines", "UAL"], "US passenger airline based in Chicago"),
    ("FedEx Corporation", "company", "FDX", ["FedEx", "FDX"], "Express package delivery company"),
    ("United Parcel Service", "company", "UPS", ["UPS"], "Package delivery and logistics company"),
    ("Taiwan Semiconductor Manufacturing", "company", "TSM", ["TSMC", "TSM"], "Largest contract chip manufacturer in the world"),
    ("Samsung Electronics", "company", None, ["Samsung"], "South Korean electronics conglomerate"),
    ("ASML Holding NV", "company", "ASML", ["ASML"], "Dutch maker of photolithography machines for chipmaking"),
    ("OpenAI", "company", None, ["OpenAI Inc."], "Artificial intelligence research and products company"),
    ("Anthropic PBC", "company", None, ["Anthropic"], "AI safety and research company"),
    ("SpaceX", "company", None, ["Space Exploration Technologies"], "Private spaceflight and satellite company"),
    ("Stripe Inc.", "company", None, ["Stripe"], "Private payments infrastructure company"),
    ("Coinbase Global", "company", "COIN", ["Coinbase", "COIN"], "Cryptocurrency exchange platform"),
    # --- organizations (SEC + Federal Reserve are hot-skew) ---
    ("Securities and Exchange Commission", "organization", None, ["SEC", "U.S. Securities and Exchange Commission"], "US federal agency regulating securities markets"),
    ("Federal Reserve", "organization", None, ["The Fed", "Fed", "Federal Reserve System", "US Federal Reserve"], "Central banking system of the United States"),
    ("Federal Reserve Bank of San Francisco", "organization", None, ["San Francisco Fed", "SF Fed"], "Regional Federal Reserve bank for the twelfth district"),
    ("Federal Reserve Bank of New York", "organization", None, ["New York Fed", "NY Fed"], "Regional Federal Reserve bank for the second district"),
    ("Federal Open Market Committee", "organization", None, ["FOMC"], "Federal Reserve committee setting US monetary policy"),
    ("European Central Bank", "organization", None, ["ECB"], "Central bank of the euro area"),
    ("Bank of England", "organization", None, ["BoE"], "Central bank of the United Kingdom"),
    ("Bank of Japan", "organization", None, ["BoJ"], "Central bank of Japan"),
    ("International Monetary Fund", "organization", None, ["IMF"], "International organization promoting monetary cooperation"),
    ("World Bank", "organization", None, ["The World Bank"], "International development finance institution"),
    ("Department of the Treasury", "organization", None, ["US Treasury", "Treasury Department", "Treasury"], "US federal executive department managing government finances"),
    ("Department of Justice", "organization", None, ["DOJ", "Justice Department"], "US federal executive department for law enforcement"),
    ("Federal Trade Commission", "organization", None, ["FTC"], "US agency enforcing antitrust and consumer protection law"),
    ("Commodity Futures Trading Commission", "organization", None, ["CFTC"], "US regulator of derivatives markets"),
    ("Financial Industry Regulatory Authority", "organization", None, ["FINRA"], "Self-regulatory organization for US broker-dealers"),
    ("Bureau of Labor Statistics", "organization", None, ["BLS"], "US agency producing employment and price statistics"),
    ("Congressional Budget Office", "organization", None, ["CBO"], "Nonpartisan US federal budget analysis agency"),
    ("Organization of the Petroleum Exporting Countries", "organization", None, ["OPEC"], "Intergovernmental oil producers organization"),
    ("World Trade Organization", "organization", None, ["WTO"], "Intergovernmental organization regulating international trade"),
    ("New York Stock Exchange", "organization", None, ["NYSE"], "Stock exchange located on Wall Street"),
    ("Nasdaq Stock Market", "organization", None, ["Nasdaq", "NASDAQ"], "US electronic stock exchange"),
    ("United Nations", "organization", None, ["UN"], "Intergovernmental organization for international cooperation"),
    ("European Union", "organization", None, ["EU"], "Political and economic union of European states"),
    ("Supreme Court of the United States", "organization", None, ["Supreme Court", "SCOTUS"], "Highest federal court of the United States"),
    ("United States Congress", "organization", None, ["Congress", "US Congress"], "Bicameral legislature of the US federal government"),
    ("The White House", "organization", None, ["White House"], "Office and residence of the US president"),
    # --- people (person != their company) ---
    ("Tim Cook", "person", None, ["Timothy D. Cook", "Timothy Cook"], "Chief executive officer of Apple"),
    ("Satya Nadella", "person", None, [], "Chief executive officer of Microsoft"),
    ("Sundar Pichai", "person", None, [], "Chief executive officer of Alphabet and Google"),
    ("Jeff Bezos", "person", None, ["Jeffrey Bezos"], "Founder and executive chairman of Amazon"),
    ("Andy Jassy", "person", None, [], "Chief executive officer of Amazon"),
    ("Mark Zuckerberg", "person", None, [], "Founder and chief executive officer of Meta"),
    ("Elon Musk", "person", None, [], "Chief executive officer of Tesla and SpaceX"),
    ("Jensen Huang", "person", None, [], "Founder and chief executive officer of NVIDIA"),
    ("Warren Buffett", "person", None, [], "Chairman and chief executive officer of Berkshire Hathaway"),
    ("Jamie Dimon", "person", None, [], "Chairman and chief executive officer of JPMorgan Chase"),
    ("Jerome Powell", "person", None, ["Jay Powell", "Chair Powell"], "Chair of the Federal Reserve"),
    ("Janet Yellen", "person", None, [], "US Treasury secretary and former Federal Reserve chair"),
    ("Christine Lagarde", "person", None, [], "President of the European Central Bank"),
    ("Gary Gensler", "person", None, [], "Former chair of the Securities and Exchange Commission"),
    ("Larry Fink", "person", None, [], "Chairman and chief executive officer of BlackRock"),
    ("Mary Barra", "person", None, [], "Chief executive officer of General Motors"),
    ("Sam Altman", "person", None, [], "Chief executive officer of OpenAI"),
    ("Lisa Su", "person", None, [], "Chief executive officer of AMD"),
    ("David Solomon", "person", None, [], "Chief executive officer of Goldman Sachs"),
    ("Brian Moynihan", "person", None, [], "Chief executive officer of Bank of America"),
    # --- locations ---
    ("United States", "location", None, ["U.S.", "US", "USA", "America"], "Country in North America"),
    ("China", "location", None, ["People's Republic of China", "PRC"], "Country in East Asia"),
    ("Japan", "location", None, [], "Island country in East Asia"),
    ("Germany", "location", None, [], "Country in Central Europe"),
    ("United Kingdom", "location", None, ["UK", "Britain"], "Country in Western Europe"),
    ("France", "location", None, [], "Country in Western Europe"),
    ("India", "location", None, [], "Country in South Asia"),
    ("Canada", "location", None, [], "Country in North America"),
    ("Mexico", "location", None, [], "Country in North America"),
    ("Brazil", "location", None, [], "Country in South America"),
    ("Taiwan", "location", None, [], "Island in East Asia and hub of semiconductor manufacturing"),
    ("South Korea", "location", None, ["Korea"], "Country in East Asia"),
    ("European Economic Area", "location", None, ["Europe"], "Region comprising European states"),
    ("New York", "location", None, ["New York City", "NYC"], "Largest city in the United States"),
    ("California", "location", None, [], "US state on the Pacific coast"),
    ("Texas", "location", None, [], "US state in the South Central region"),
    ("Hawaii", "location", None, [], "US state consisting of Pacific islands"),
    ("Silicon Valley", "location", None, [], "Technology industry region in the San Francisco Bay Area"),
    ("Wall Street", "location", None, [], "Financial district of New York City"),
    ("Washington", "location", None, ["Washington D.C.", "Washington, D.C."], "Capital of the United States"),
    ("San Francisco", "location", None, [], "City in Northern California"),
    ("Seattle", "location", None, [], "City in Washington State"),
    ("London", "location", None, [], "Capital of the United Kingdom"),
    ("Tokyo", "location", None, [], "Capital of Japan"),
    ("Shanghai", "location", None, [], "Financial center of China"),
    # --- products (product != maker) ---
    ("iPhone", "product", None, [], "Smartphone line designed by Apple"),
    ("iPad", "product", None, [], "Tablet computer line designed by Apple"),
    ("Mac", "product", None, ["MacBook"], "Personal computer line designed by Apple"),
    ("Vision Pro", "product", None, ["Apple Vision Pro"], "Mixed reality headset designed by Apple"),
    ("Azure", "product", None, ["Microsoft Azure"], "Cloud computing platform operated by Microsoft"),
    ("Windows", "product", None, [], "Operating system family developed by Microsoft"),
    ("Office 365", "product", None, ["Microsoft 365"], "Productivity software subscription by Microsoft"),
    ("ChatGPT", "product", None, [], "Conversational AI assistant built by OpenAI"),
    ("GPT-4", "product", None, [], "Large language model developed by OpenAI"),
    ("Claude", "product", None, [], "AI assistant built by Anthropic"),
    ("Gemini", "product", None, [], "AI model family developed by Google"),
    ("Android", "product", None, [], "Mobile operating system developed by Google"),
    ("Model Y", "product", None, ["Tesla Model Y"], "Electric crossover vehicle made by Tesla"),
    ("Model 3", "product", None, ["Tesla Model 3"], "Electric sedan made by Tesla"),
    ("Cybertruck", "product", None, [], "Electric pickup truck made by Tesla"),
    ("H100", "product", None, ["H100 GPU"], "Data center AI accelerator designed by NVIDIA"),
    ("Blackwell", "product", None, ["B200"], "GPU architecture designed by NVIDIA"),
    ("Prime", "product", None, ["Amazon Prime"], "Subscription program operated by Amazon"),
    ("Kindle", "product", None, [], "E-reader device line made by Amazon"),
    ("737 MAX", "product", None, ["Boeing 737 MAX"], "Narrow-body airliner made by Boeing"),
    ("Dreamliner", "product", None, ["787 Dreamliner"], "Wide-body airliner made by Boeing"),
    ("Bitcoin", "product", None, ["BTC"], "Decentralized digital currency"),
    ("Ethereum", "product", None, ["ETH"], "Decentralized smart-contract platform and currency"),
    ("S&P 500", "product", None, ["S&P500", "SPX"], "Stock market index of 500 large US companies"),
    ("Dow Jones Industrial Average", "product", None, ["Dow Jones", "the Dow", "DJIA"], "Price-weighted index of 30 large US companies"),
    ("Nasdaq Composite", "product", None, [], "Market-cap-weighted index of Nasdaq-listed stocks"),
    ("10-year Treasury note", "product", None, ["10-year Treasury", "10-year note"], "Benchmark US government debt security"),
    ("Brent crude", "product", None, ["Brent"], "Benchmark oil price for international markets"),
    ("West Texas Intermediate", "product", None, ["WTI"], "Benchmark oil price for North American markets"),
]

# (label, definition, [synonyms]) — concept/topic ontology, reference-shaped.
_T = [
    ("Inflation", "Sustained rise in the general price level of goods and services", ["CPI", "consumer prices", "price pressures", "inflationary pressure", "core inflation"]),
    ("Deflation", "Sustained fall in the general price level", ["price declines", "deflationary pressure"]),
    ("GDP", "Total value of goods and services produced in an economy", ["gross domestic product", "economic output", "economic growth"]),
    ("Unemployment", "Share of the labor force without work and seeking it", ["joblessness", "unemployment rate", "job losses", "layoffs"]),
    ("Employment", "Level of paid work in the economy", ["jobs", "hiring", "job growth", "payrolls", "nonfarm payrolls"]),
    ("Interest Rates", "Cost of borrowing money, steered by central banks", ["rates", "fed funds rate", "policy rate", "borrowing costs", "rate hikes", "rate cuts"]),
    ("Monetary Policy", "Central bank management of money supply and rates", ["fed policy", "central bank policy", "quantitative easing", "quantitative tightening", "tightening cycle"]),
    ("Fiscal Policy", "Government taxation and spending decisions", ["government spending", "tax policy", "budget policy", "stimulus"]),
    ("Labor Market", "Supply and demand dynamics for workers", ["job market", "workforce", "labor conditions", "labor shortage", "labor supply"]),
    ("Wage Growth", "Rate of increase in worker compensation", ["wages", "compensation", "salary increases", "wage pressures", "pay raises"]),
    ("Earnings", "Corporate profits reported to investors", ["quarterly earnings", "profits", "net income", "earnings per share", "EPS", "earnings report"]),
    ("Revenue", "Total income from sales of goods and services", ["sales", "turnover", "top line", "revenues"]),
    ("Guidance", "Company forecasts of future financial performance", ["outlook", "forecast", "projections", "full-year guidance"]),
    ("Mergers and Acquisitions", "Consolidation of companies through transactions", ["M&A", "merger", "acquisition", "takeover", "buyout", "deal activity"]),
    ("Initial Public Offering", "First sale of a company's shares to the public", ["IPO", "public offering", "listing", "going public"]),
    ("Dividends", "Cash distributions of profits to shareholders", ["dividend", "payout", "dividend yield"]),
    ("Share Buybacks", "Company repurchases of its own stock", ["buyback", "stock repurchase", "repurchase program"]),
    ("Stock Market", "Market for trading equity securities", ["equities", "equity market", "stocks", "shares"]),
    ("Bond Market", "Market for trading debt securities", ["bonds", "fixed income", "credit market", "treasuries", "yields"]),
    ("Commodities", "Markets for raw materials and primary goods", ["commodity prices", "raw materials"]),
    ("Oil Prices", "Market price of crude oil", ["crude prices", "crude oil", "energy prices", "oil market"]),
    ("Gold", "Precious metal traded as a store of value", ["gold prices", "bullion"]),
    ("Cryptocurrency", "Digital assets on decentralized ledgers", ["crypto", "digital assets", "tokens"]),
    ("Housing Market", "Market for residential real estate", ["housing", "home prices", "home sales", "mortgage rates", "residential construction"]),
    ("Commercial Real Estate", "Market for income-producing property", ["CRE", "office market", "commercial property"]),
    ("Manufacturing", "Production of physical goods", ["factory activity", "industrial production", "factory orders"]),
    ("Supply Chain", "Networks moving goods from producers to consumers", ["supply chains", "logistics", "shipping", "supply disruptions", "inventories"]),
    ("Consumer Spending", "Household purchases of goods and services", ["retail sales", "consumer demand", "consumption", "consumer confidence"]),
    ("Trade", "Exchange of goods and services across borders", ["exports", "imports", "trade deficit", "trade balance", "international trade"]),
    ("Tariffs", "Taxes on imported goods", ["tariff", "trade barriers", "duties", "trade war"]),
    ("Regulation", "Government rules governing business conduct", ["regulatory scrutiny", "compliance", "rulemaking", "oversight"]),
    ("Antitrust", "Law and enforcement against anticompetitive conduct", ["competition law", "monopoly concerns", "antitrust enforcement"]),
    ("Bankruptcy", "Legal process for insolvent debtors", ["insolvency", "chapter 11", "restructuring", "default"]),
    ("Artificial Intelligence", "Computer systems performing tasks requiring intelligence", ["AI", "machine learning", "generative AI", "large language models"]),
    ("Cloud Computing", "On-demand computing infrastructure and services", ["cloud", "cloud services", "data centers"]),
    ("Semiconductors", "Chips powering electronic devices", ["chips", "chipmaking", "chip industry", "microchips"]),
    ("Electric Vehicles", "Automobiles powered by electric motors", ["EVs", "EV market", "electrification"]),
    ("Renewable Energy", "Energy from naturally replenished sources", ["clean energy", "solar", "wind power", "green energy"]),
    ("Cybersecurity", "Protection of systems and data from attack", ["data breach", "hacking", "ransomware", "security incident"]),
    ("Recession", "Significant broad decline in economic activity", ["economic downturn", "contraction", "hard landing", "economic slowdown"]),
    ("Banking Sector", "Industry of deposit-taking and lending institutions", ["banks", "regional banks", "banking industry", "lenders"]),
    ("Venture Capital", "Financing of early-stage companies", ["VC", "startup funding", "venture funding"]),
    ("Credit Conditions", "Availability and terms of borrowing", ["lending standards", "credit availability", "loan demand", "credit crunch"]),
    ("Productivity", "Output produced per unit of input", ["labor productivity", "efficiency gains"]),
    ("Tourism", "Travel industry and visitor economy", ["travel demand", "hospitality", "visitor spending", "leisure travel"]),
    ("Agriculture", "Farming and food production sector", ["farm sector", "crop prices", "farming"]),
    # root topics of the two-level hierarchy (Topic.parent_topic,
    # reference types/topics.py:18-35). Kept synonym-free so adding the
    # hierarchy does not perturb mention matching.
    ("Macroeconomics", "Economy-wide conditions: growth, prices, employment", []),
    ("Corporate Finance", "Company-level financial performance and actions", []),
    ("Financial Markets", "Markets for securities, commodities and currencies", []),
    ("Industry Sectors", "Conditions in specific industries", []),
    ("Policy and Regulation", "Government and central-bank rules and actions", []),
]

# child label -> parent label (two-level ontology; unlisted labels are roots)
_T_PARENT = {
    "Inflation": "Macroeconomics", "Deflation": "Macroeconomics",
    "GDP": "Macroeconomics", "Unemployment": "Macroeconomics",
    "Employment": "Macroeconomics", "Labor Market": "Macroeconomics",
    "Wage Growth": "Macroeconomics", "Consumer Spending": "Macroeconomics",
    "Trade": "Macroeconomics", "Recession": "Macroeconomics",
    "Productivity": "Macroeconomics", "Credit Conditions": "Macroeconomics",
    "Earnings": "Corporate Finance", "Revenue": "Corporate Finance",
    "Guidance": "Corporate Finance",
    "Mergers and Acquisitions": "Corporate Finance",
    "Initial Public Offering": "Corporate Finance",
    "Dividends": "Corporate Finance", "Share Buybacks": "Corporate Finance",
    "Bankruptcy": "Corporate Finance", "Venture Capital": "Corporate Finance",
    "Stock Market": "Financial Markets", "Bond Market": "Financial Markets",
    "Commodities": "Financial Markets", "Oil Prices": "Financial Markets",
    "Gold": "Financial Markets", "Cryptocurrency": "Financial Markets",
    "Housing Market": "Industry Sectors",
    "Commercial Real Estate": "Industry Sectors",
    "Manufacturing": "Industry Sectors", "Supply Chain": "Industry Sectors",
    "Artificial Intelligence": "Industry Sectors",
    "Cloud Computing": "Industry Sectors",
    "Semiconductors": "Industry Sectors",
    "Electric Vehicles": "Industry Sectors",
    "Renewable Energy": "Industry Sectors",
    "Cybersecurity": "Industry Sectors",
    "Banking Sector": "Industry Sectors", "Tourism": "Industry Sectors",
    "Agriculture": "Industry Sectors",
    "Interest Rates": "Policy and Regulation",
    "Monetary Policy": "Policy and Regulation",
    "Fiscal Policy": "Policy and Regulation",
    "Tariffs": "Policy and Regulation",
    "Regulation": "Policy and Regulation",
    "Antitrust": "Policy and Regulation",
}


def registry_rows() -> list[dict]:
    """Canonical registry rows with deterministic uuids."""
    from .functions.textops import norm_name, stable_id

    rows = []
    for name, etype, ticker, aliases, definition in _R:
        rows.append(
            {
                "entity_uuid": stable_id("registry", norm_name(name), etype),
                "canonical_name": name,
                "entity_type": etype,
                "ticker": ticker,
                "aliases": list(aliases),
                "definition": definition,
            }
        )
    return rows


def ontology_rows() -> list[dict]:
    """Topic ontology rows with deterministic uuids (uri last segment) and
    a two-level parent hierarchy (Topic.parent_topic, types/topics.py)."""
    from .functions.textops import stable_id

    rows = []
    for label, definition, synonyms in _T:
        seg = label.replace(" ", "")
        parent = _T_PARENT.get(label)
        rows.append(
            {
                "topic_uuid": stable_id("topic", seg),
                "uri": f"https://example.org/topic/{seg}",
                "label": label,
                "definition": definition,
                "synonyms": list(synonyms),
                "parent_label": parent,
                "parent_uuid": (
                    stable_id("topic", parent.replace(" ", "")) if parent else None
                ),
            }
        )
    return rows


def gazetteer_entries() -> list[tuple[str, str, str, str, str]]:
    """Flattened (surface_norm, surface, kind, ref_uuid, entity_type) for the
    broadcast trie: every canonical name, alias, ticker, topic label and
    synonym, normalized. kind is 'entity' or 'topic'."""
    from .functions.textops import norm_name

    out: dict[str, tuple[str, str, str, str, str]] = {}
    for r in registry_rows():
        surfaces = [r["canonical_name"], *r["aliases"]]
        if r["ticker"]:
            surfaces.append(r["ticker"])
        for s in surfaces:
            key = norm_name(s)
            if key and key not in out:
                out[key] = (key, s, "entity", r["entity_uuid"], r["entity_type"])
    for t in ontology_rows():
        for s in [t["label"], *t["synonyms"]]:
            key = norm_name(s)
            if key and key not in out:
                out[key] = (key, s, "topic", t["topic_uuid"], "concept")
    return sorted(out.values())
