"""Benchmark / demo rulesets.

``BENCH_SML`` models a production-scale moderation ruleset over the
transcripts table — the reference's deployments run dozens of
features and rules per action (example_rules/ has a whole tree of
*.sml per action type), so throughput benchmarks use this rather
than a toy 3-rule program. Everything compiles to JVM Column
expressions (regex, hashes, string ops) — no Python in the row path.
"""

BENCH_SML = r"""
ConvId: Entity[str] = EntityJson(type='ConvId', path='$.conv_id')
Role: str = JsonData(path='$.role')
TurnIdx: int = JsonData(path='$.turn_idx')
TurnText: str = JsonData(path='$.text')
ToolName: Optional[str] = JsonData(path='$.tool', required=False)

TextLower = StringToLower(s=TurnText)
TextLen = StringLength(s=TurnText)
Tokens = StringSplit(s=TextLower, sep=' ')
NumTokens = ListLength(list=Tokens)
MeanTokenLen = TextLen / NumTokens
TextMd5 = HashMd5(s=TextLower)
TextSha256 = HashSha256(s=TurnText)
ContentKey = HashSha1(s=TextLower)

Urls = StringExtractURLs(s=TurnText)
NumUrls = ListLength(list=Urls)
Domains = StringExtractDomains(s=TurnText)
NumDomains = ListLength(list=Domains)
HasUrl = NumUrls > 0
HasSpamDomain = 'spam.example.com' in Domains
HasShortener = RegexMatch(target=TextLower, pattern='(bit\.ly|tinyurl\.com|t\.co)/')

HasEmail = RegexMatch(target=TurnText, pattern='[\w.+-]+@[\w-]+\.[\w.]+')
HasPhone = RegexMatch(target=TurnText, pattern='\+?[0-9][0-9 ()\-]{7,}[0-9]')
HasInvite = RegexMatch(target=TextLower, pattern='(discord\.gg|t\.me/|join my)')
HasShout = RegexMatch(target=TurnText, pattern='\b[A-Z]{5,}\b')
HasRepeatChars = RegexMatch(target=TurnText, pattern='(.)\1{4,}')
HasHello = 'hello' in TextLower
MentionsMoney = RegexMatch(target=TextLower, pattern='(free money|\$[0-9]+|crypto|giveaway)')

IsToolTurn = Role == 'tool'
IsAssistant = Role == 'assistant'
IsUser = Role == 'user'
LongText = TextLen > 60
ShortText = TextLen < 8
ManyTokens = NumTokens >= 12
DeepTurn = TurnIdx >= 20

Cohort = Experiment(entity=ConvId, buckets=['control', 'treatment'], name='bench', version=1)

SpamLinkRule = Rule(
    when_all=[HasUrl, HasSpamDomain],
    description='link to a known spam domain')
ShortenerRule = Rule(
    when_all=[HasShortener, IsUser],
    description='user posted a link shortener')
ContactScrapeRule = Rule(
    when_all=[HasEmail, HasPhone],
    description='email + phone in one turn')
InviteSpamRule = Rule(
    when_all=[HasInvite, ManyTokens],
    description='wordy invite spam')
ShoutingRule = Rule(
    when_all=[HasShout, LongText],
    description='sustained shouting')
RepeatFloodRule = Rule(
    when_all=[HasRepeatChars, ShortText],
    description='character flood')
MoneySpamRule = Rule(
    when_all=[MentionsMoney, HasUrl],
    description='money bait with a link')
ToolChatterRule = Rule(
    when_all=[IsToolTurn, ManyTokens],
    description='wordy tool turn')
DeepSpamRule = Rule(
    when_all=[DeepTurn, MentionsMoney],
    description='late-conversation money bait')
HelloRule = Rule(when_all=[HasHello], description='says hello')

WhenRules(
    rules_any=[SpamLinkRule, ShortenerRule, InviteSpamRule, MoneySpamRule],
    then=[DeclareVerdict(verdict='spam'),
          LabelAdd(entity=ConvId, label='spam_suspect')])
WhenRules(
    rules_any=[ContactScrapeRule],
    then=[DeclareVerdict(verdict='scrape'),
          LabelAdd(entity=ConvId, label='scraper')])
WhenRules(
    rules_any=[ShoutingRule, RepeatFloodRule, ToolChatterRule, DeepSpamRule],
    then=[DeclareVerdict(verdict='review')])
WhenRules(
    rules_any=[HelloRule],
    then=[DeclareVerdict(verdict='hello')])
"""
